"""LSHIndex property tests: insert->query, delete, dedup, recall, persistence
(SURVEY.md §4 test plan (2)-(3))."""

import numpy as np
import pytest

from zebra_tpu.config import IndexOptions
from zebra_tpu.index.lsh import LSHIndex


def make_index(dim=32, metric="cosine", **kw):
    defaults = dict(num_tables=8, num_probes=8, seed=0)
    defaults.update(kw)
    return LSHIndex(dim=dim, metric=metric, options=IndexOptions(**defaults))


def brute_force_ids(index, data, ids, q, k, metric):
    from zebra_tpu.ops.distances import pairwise

    d = np.asarray(pairwise(q, data, metric=metric))
    order = np.argsort(d, axis=1)[:, :k]
    return [[ids[j] for j in row] for row in order]


def test_insert_then_query_returns_inserted(rng):
    idx = make_index()
    data = rng.standard_normal((200, 32)).astype(np.float32)
    ids = idx.add(data)
    assert len(ids) == 200 and len(set(ids)) == 200
    res = idx.search(data[:10], k=1)
    for i, row in enumerate(res):
        assert row, f"query {i} returned nothing"
        assert row[0][0] == ids[i]
        assert row[0][1] < 1e-4


def test_distances_sorted_ascending(rng):
    idx = make_index()
    idx.add(rng.standard_normal((300, 32)).astype(np.float32))
    for row in idx.search(rng.standard_normal((5, 32)).astype(np.float32), k=10):
        d = [x[1] for x in row]
        assert d == sorted(d)


def test_remove_excludes_from_results(rng):
    idx = make_index()
    data = rng.standard_normal((100, 32)).astype(np.float32)
    ids = idx.add(data)
    removed = idx.remove(ids[:50])
    assert set(removed) == set(ids[:50])
    res = idx.search(data[:50], k=5)
    surviving = set(ids[50:])
    for row in res:
        for rid, _ in row:
            assert rid in surviving
    assert len(idx) == 50


def test_remove_unknown_ids_noop(rng):
    idx = make_index()
    idx.add(rng.standard_normal((20, 32)).astype(np.float32))
    assert idx.remove([b"\x00" * 16]) == []
    assert len(idx) == 20


def test_deduplicate(rng):
    idx = make_index()
    data = rng.standard_normal((50, 32)).astype(np.float32)
    dup = np.concatenate([data, data[:20]], axis=0)
    idx.add(dup)
    removed = idx.deduplicate()
    assert len(removed) == 20
    assert len(idx) == 50
    # earliest copy kept: the survivors are the first 50 inserted
    res = idx.search(data[:5], k=1)
    for row in res:
        assert row[0][1] < 1e-4


def test_clear_and_rebuild(rng):
    idx = make_index()
    idx.add(rng.standard_normal((64, 32)).astype(np.float32))
    idx.clear()
    assert idx.is_empty() and len(idx) == 0
    assert idx.search(rng.standard_normal((2, 32)).astype(np.float32), 3) == [[], []]
    ids = idx.add(rng.standard_normal((64, 32)).astype(np.float32))
    assert len(ids) == 64


def clustered(rng, n, dim, n_clusters=64, spread=0.15):
    """Clustered data + queries near db points — the regime ANN recall targets
    describe (on pure random Gaussians the k-NN are barely nearer than random,
    and every LSH — the reference's included — degrades)."""
    centers = rng.standard_normal((n_clusters, dim)).astype(np.float32)
    assign = rng.integers(0, n_clusters, n)
    data = centers[assign] + spread * rng.standard_normal((n, dim)).astype(np.float32)
    return data.astype(np.float32)


@pytest.mark.parametrize("metric", ["cosine", "sql2"])
def test_recall_vs_brute_force(rng, metric):
    # BASELINE config (1) shape: insert + top-10 query, recall target >= 0.9
    n, dim, nq, k = 4000, 64, 50, 10
    data = clustered(rng, n, dim)
    qi = rng.permutation(n)[:nq]
    q = data[qi] + 0.05 * rng.standard_normal((nq, dim)).astype(np.float32)
    idx = make_index(dim=dim, metric=metric, num_tables=15, num_probes=12)
    ids = idx.add(data)
    truth = brute_force_ids(idx, data, ids, q, k, metric)
    res = idx.search(q, k=k)
    hits = total = 0
    for row, t in zip(res, truth):
        got = {i for i, _ in row}
        hits += len(got & set(t))
        total += k
    recall = hits / total
    assert recall >= 0.9, f"recall@10 = {recall:.3f}"


@pytest.mark.parametrize("metric", ["manhattan", "chebyshev", "l4"])
def test_non_mxu_metrics_through_index(rng, metric):
    """The re-rank has a separate code path for metrics without a Gram
    expansion — exercise it end-to-end."""
    from zebra_tpu.ops.distances import pairwise

    n, dim, k = 400, 24, 5
    data = rng.standard_normal((n, dim)).astype(np.float32)
    idx = make_index(dim=dim, metric=metric, num_tables=10, num_probes=10)
    ids = idx.add(data)
    q = data[:4] + 0.01 * rng.standard_normal((4, dim)).astype(np.float32)
    res = idx.search(q, k=k)
    d = np.asarray(pairwise(q, data, metric=metric))
    for b, row in enumerate(res):
        assert row[0][0] == ids[b]  # self-match first
        dd = [x[1] for x in row]
        assert dd == sorted(dd)
        # distances reported must match the metric's true values
        got_ids = [i for i, _ in row]
        for (rid, rdist) in row:
            j = ids.index(rid)
            np.testing.assert_allclose(rdist, d[b, j], rtol=1e-4, atol=1e-4)


def test_exact_search_matches_brute_force(rng):
    n, dim, k = 500, 16, 5
    data = rng.standard_normal((n, dim)).astype(np.float32)
    idx = make_index(dim=dim)
    ids = idx.add(data)
    q = rng.standard_normal((3, dim)).astype(np.float32)
    truth = brute_force_ids(idx, data, ids, q, k, "cosine")
    res = idx.search(q, k=k, exact=True)
    for row, t in zip(res, truth):
        assert [i for i, _ in row] == t


def test_incremental_insert_after_build(rng):
    idx = make_index()
    a = rng.standard_normal((100, 32)).astype(np.float32)
    b = rng.standard_normal((100, 32)).astype(np.float32)
    idx.add(a)
    ids_b = idx.add(b)
    res = idx.search(b[:10], k=1)
    for i, row in enumerate(res):
        assert row[0][0] == ids_b[i]


def test_slab_growth_and_rebuild(rng):
    idx = make_index(slab_capacity=0)
    total = 0
    all_ids = []
    for _ in range(6):
        batch = rng.standard_normal((500, 32)).astype(np.float32)
        all_ids += idx.add(batch)
        total += 500
    assert len(idx) == total
    # after heavy growth the index must still answer correctly
    probe = rng.standard_normal((32,)).astype(np.float32)
    assert idx.search(probe, k=5)[0]


def test_save_load_roundtrip(rng, tmp_path):
    idx = make_index()
    data = rng.standard_normal((150, 32)).astype(np.float32)
    ids = idx.add(data)
    idx.remove(ids[:10])
    idx.save(str(tmp_path / "idx"))
    idx2 = LSHIndex.load(str(tmp_path / "idx"))
    assert len(idx2) == 140
    r1 = idx.search(data[10:20], k=3)
    r2 = idx2.search(data[10:20], k=3)
    assert [[i for i, _ in row] for row in r1] == [[i for i, _ in row] for row in r2]


def test_add_after_reload_does_not_clobber(rng, tmp_path):
    """Regression: load() must restore the host bump allocator, else new adds
    overwrite slot 0.. of the reopened index."""
    idx = make_index()
    a = rng.standard_normal((80, 32)).astype(np.float32)
    ids_a = idx.add(a)
    idx.save(str(tmp_path / "r"))
    idx2 = LSHIndex.load(str(tmp_path / "r"))
    assert idx2._next_slot == idx._next_slot
    b = rng.standard_normal((40, 32)).astype(np.float32)
    ids_b = idx2.add(b)
    # both old and new vectors must resolve to themselves
    for probe, want in ((a[:5], ids_a[:5]), (b[:5], ids_b[:5])):
        res = idx2.search(probe, k=1)
        for i, row in enumerate(res):
            assert row[0][0] == want[i]
            assert row[0][1] < 1e-3
    st = idx2.stats()
    assert st["used_slots"] == 120 and st["tombstones"] == 0


def test_empty_index_queries(rng):
    idx = make_index()
    assert idx.search(rng.standard_normal((3, 32)).astype(np.float32), 5) == [[], [], []]
    assert idx.no_vectors() and idx.is_empty()


def test_user_supplied_id_validation(rng):
    """Snapshot format contract: ids are 16 bytes, non-zero, unique."""
    idx = make_index(dim=8)
    v = rng.standard_normal((3, 8)).astype(np.float32)
    with pytest.raises(ValueError, match="16-byte"):
        idx.add(v, ids=[b"short", b"x" * 16, b"y" * 16])
    with pytest.raises(ValueError, match="reserved"):
        idx.add(v, ids=[b"\x00" * 16, b"x" * 16, b"y" * 16])
    with pytest.raises(ValueError, match="duplicate"):
        idx.add(v, ids=[b"x" * 16, b"x" * 16, b"y" * 16])
    ok = [bytes([i] * 16) for i in (1, 2, 3)]
    idx.add(v, ids=ok)
    with pytest.raises(ValueError, match="duplicate"):
        idx.add(v[:1], ids=ok[:1])  # collides with an existing id
    assert len(idx) == 3


def test_lsh_k_wider_than_candidate_chunks(rng):
    """k larger than re-rank chunks / bucket candidate widths must clamp,
    not crash (same round-2 advisor class as the IVF block fix)."""
    idx = make_index()
    data = rng.standard_normal((300, 32)).astype(np.float32)
    ids = idx.add(data)
    res = idx.search(data[:4], k=64)
    for i, row in enumerate(res):
        assert row and row[0][0] == ids[i]
        assert len({r for r, _ in row}) == len(row)  # no duplicate ids
    # k beyond the whole database through the exact path too
    res_all = idx.search(data[:2], k=512, exact=True)
    assert all(len(row) == 300 for row in res_all)
