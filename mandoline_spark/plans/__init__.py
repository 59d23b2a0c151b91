"""Plan inspection helpers — assertions about the physical plan that the
engine's tests (and users) can make: is the filter pushed to the scan,
is the small side broadcast, did whole-stage codegen apply.

The reference engine exposes nothing comparable (its only "plan" is the
chunk-coordinate enumeration, chunk.clj:11-25); this is the Spark-native
observability surface that makes the 100 TB properties checkable."""

from .inspect import (
    explain_str,
    has_broadcast_join,
    has_sort_merge_join,
    pushed_filters,
    scan_read_schema,
    wholestage_codegen_ids,
)

__all__ = [
    "explain_str",
    "has_broadcast_join",
    "has_sort_merge_join",
    "pushed_filters",
    "scan_read_schema",
    "wholestage_codegen_ids",
]
