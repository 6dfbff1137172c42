"""Pure, jit-friendly array ops: distances, hashing, top-k, re-rank kernels."""

from zebra_tpu.ops.distances import METRICS, pairwise, rowwise
from zebra_tpu.ops.hashing import (
    sample_planes_random,
    sample_planes_data,
    hash_activations,
    pack_signs,
    hash_codes,
    multiprobe,
)
from zebra_tpu.ops.topk import masked_topk, merge_topk

__all__ = [
    "METRICS",
    "pairwise",
    "rowwise",
    "sample_planes_random",
    "sample_planes_data",
    "hash_activations",
    "pack_signs",
    "hash_codes",
    "multiprobe",
    "masked_topk",
    "merge_topk",
]
