"""Direct unit tests of the bucket-append primitive (reservoir semantics)."""

import jax.numpy as jnp
import numpy as np
import pytest

from zebra_tpu.index import buckets as B


def append(bucket, count, codes, slots, salt=1):
    nb, nc, ovf = B._append_one_table(
        jnp.asarray(bucket), jnp.asarray(count), jnp.asarray(codes),
        jnp.asarray(slots), jnp.int32(salt),
    )
    return np.asarray(nb), np.asarray(nc), int(ovf)


def test_append_groups_by_code():
    R, C, n = 8, 4, 6
    bucket = np.full((R, C), -1, np.int32)
    count = np.zeros(R, np.int32)
    codes = np.array([2, 5, 2, 5, 2, 7], np.int32)
    slots = np.arange(n, dtype=np.int32)
    nb, nc, ovf = append(bucket, count, codes, slots)
    assert ovf == 0
    assert sorted(nb[2][nb[2] >= 0].tolist()) == [0, 2, 4]
    assert sorted(nb[5][nb[5] >= 0].tolist()) == [1, 3]
    assert nb[7][0] == 5
    assert nc[2] == 3 and nc[5] == 2 and nc[7] == 1


def test_append_continues_from_counts():
    R, C = 4, 4
    bucket = np.full((R, C), -1, np.int32)
    bucket[1, :2] = [100, 101]
    count = np.array([0, 2, 0, 0], np.int32)
    nb, nc, _ = append(bucket, count, np.array([1], np.int32), np.array([7], np.int32))
    assert nb[1, 2] == 7 and nc[1] == 3
    assert nb[1, 0] == 100 and nb[1, 1] == 101  # existing entries untouched


def test_overflow_reservoir_keeps_capacity_and_counts_true():
    R, C, n = 2, 4, 64
    bucket = np.full((R, C), -1, np.int32)
    count = np.zeros(R, np.int32)
    codes = np.zeros(n, np.int32)  # everything hashes to bucket 0
    slots = np.arange(n, dtype=np.int32)
    nb, nc, ovf = append(bucket, count, codes, slots)
    assert nc[0] == n  # true occupancy, not clipped
    assert ovf == n - C
    kept = nb[0]
    assert (kept >= 0).all() and len(set(kept.tolist())) == C
    assert set(kept.tolist()) <= set(range(n))


def test_overflow_decorrelated_across_salts():
    """Different tables (salts) must keep DIFFERENT random samples — the
    whole point of reservoir sampling here."""
    R, C, n = 2, 4, 200
    bucket = np.full((R, C), -1, np.int32)
    count = np.zeros(R, np.int32)
    codes = np.zeros(n, np.int32)
    slots = np.arange(n, dtype=np.int32)
    kept = []
    for salt in range(1, 9):
        nb, _, _ = append(bucket, count, codes, slots, salt=salt)
        kept.append(frozenset(nb[0].tolist()))
    assert len(set(kept)) > 4  # salts produce distinct samples
    union = set().union(*kept)
    assert len(union) >= 12  # coverage far beyond one bucket's capacity


def test_pad_rows_dropped():
    R, C = 4, 2
    bucket = np.full((R, C), -1, np.int32)
    count = np.zeros(R, np.int32)
    codes = np.array([1, int(B.OOB), int(B.OOB)], np.int32)
    slots = np.array([9, int(B.OOB), int(B.OOB)], np.int32)
    nb, nc, ovf = append(bucket, count, codes, slots)
    assert nb[1, 0] == 9 and nc.sum() == 1 and ovf == 0


def test_query_huge_batch_chunks_match_unchunked(monkeypatch):
    """Shrinking the transient budget forces the on-device lax.map split;
    results must match the single-dispatch path batch-for-batch (the 1M x
    768 x qb=16384 LSH compile-OOM fix)."""
    import numpy as np

    from zebra_tpu.index import buckets as B
    from zebra_tpu.index.lsh import LSHIndex
    from zebra_tpu.config import IndexOptions

    rng = np.random.default_rng(5)
    pts = rng.standard_normal((400, 16)).astype(np.float32)
    idx = LSHIndex(dim=16, metric="sql2",
                   options=IndexOptions(num_tables=4, bits=4, seed=0))
    idx.add(pts)
    qs = pts[:96] + 0.01
    want = idx.search(qs, k=5)
    monkeypatch.setattr(B, "_BATCH_TRANSIENT_BUDGET", 200_000)
    got = idx.search(qs, k=5)
    assert got == want
