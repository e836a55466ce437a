from .config import ConfigError, validate_config

__all__ = ["validate_config", "ConfigError"]
