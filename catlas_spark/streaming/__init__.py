from .events import run_batch_like_stream, sessionized_stream, tumbling_counts

__all__ = ["tumbling_counts", "sessionized_stream", "run_batch_like_stream"]
