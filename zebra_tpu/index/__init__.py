"""LSH bucket-table index: device state/ops plus the host orchestration layer."""

from zebra_tpu.index.buckets import IndexState, empty_state, insert, delete_slots, query, brute_force
from zebra_tpu.index.lsh import LSHIndex

__all__ = [
    "IndexState",
    "empty_state",
    "insert",
    "delete_slots",
    "query",
    "brute_force",
    "LSHIndex",
]
