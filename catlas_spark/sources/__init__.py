from .star import STAR_TABLES, load_star, load_table

__all__ = ["STAR_TABLES", "load_star", "load_table"]
