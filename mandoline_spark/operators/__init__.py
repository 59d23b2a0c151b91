"""Composite relational operators Spark has no single built-in for:
as-of joins, point-in-interval range joins, grouped top-k, connected
components.  Each is a composition of DataFrame primitives chosen for
its shuffle shape at scale (documented per function)."""

from .graph import connected_components, dedup_clusters
from .joins import asof_join, range_join, topk_per_group

__all__ = [
    "asof_join",
    "range_join",
    "topk_per_group",
    "connected_components",
    "dedup_clusters",
]

from .joins import salted_join  # noqa: E402

__all__.append("salted_join")
