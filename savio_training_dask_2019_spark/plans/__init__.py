"""Physical-plan introspection helpers (SURVEY.md §4): the engine's
self-check that Catalyst is producing the plans we design for — pushed
filters, pruned schemas, broadcast joins, whole-stage codegen spans.

Used by the performance tests; at 100 TB these assertions are the difference
between scanning 100 TB and scanning the 2 columns × 3 partitions a query
actually needs.
"""

from .explain import (
    bnlj_count,
    broadcast_join_count,
    formatted_plan,
    pushed_filters,
    read_schema_columns,
    scan_count,
    shuffle_count,
    single_partition_exchange_count,
    unpartitioned_window_count,
)

__all__ = [
    "formatted_plan",
    "pushed_filters",
    "read_schema_columns",
    "scan_count",
    "shuffle_count",
    "single_partition_exchange_count",
    "unpartitioned_window_count",
    "bnlj_count",
    "broadcast_join_count",
]
