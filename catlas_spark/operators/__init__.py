from .relational import (
    best_within_relative_threshold,
    group_exists_mark,
    grouped_min_argmin,
    grouped_topk,
    soft_delete_gate,
)

__all__ = [
    "grouped_topk",
    "best_within_relative_threshold",
    "group_exists_mark",
    "grouped_min_argmin",
    "soft_delete_gate",
]
