"""CRUD churn: interleaved insert/delete/query (BASELINE config 5, scaled
down for CI; the full 10M-vector version runs via bench.py --churn)."""

import numpy as np
import pytest

from zebra_tpu.config import IndexOptions
from zebra_tpu.index.lsh import LSHIndex
from zebra_tpu.parallel.sharded import ShardedLSHIndex


@pytest.mark.parametrize("cls,kw", [(LSHIndex, {}), (ShardedLSHIndex, {"shards": 8})])
def test_churn_interleaved(rng, cls, kw):
    dim = 32
    idx = cls(dim=dim, metric="cosine",
              options=IndexOptions(num_tables=8, num_probes=8, seed=0), **kw)
    live: dict[bytes, np.ndarray] = {}
    for round_i in range(6):
        # insert a wave
        batch = rng.standard_normal((300, dim)).astype(np.float32)
        ids = idx.add(batch)
        live.update(zip(ids, batch))
        # delete a random third of everything live
        all_ids = list(live)
        kill = [all_ids[j] for j in rng.permutation(len(all_ids))[: len(all_ids) // 3]]
        removed = idx.remove(kill)
        assert set(removed) == set(kill)
        for i in kill:
            del live[i]
        assert len(idx) == len(live)

        # queries only ever return live ids, and self-lookup works
        probe_ids = [all_ids[j] for j in rng.permutation(len(all_ids))[:10] if all_ids[j] in live]
        if probe_ids:
            qs = np.stack([live[i] for i in probe_ids])
            res = idx.search(qs, k=5)
            for qi, row in enumerate(res):
                assert row, f"round {round_i}: query returned nothing"
                returned = [i for i, _ in row]
                assert all(i in live for i in returned)
                assert returned[0] == probe_ids[qi]


def test_churn_triggers_compaction(rng):
    idx = LSHIndex(dim=16, metric="cosine",
                   options=IndexOptions(num_tables=4, num_probes=4, seed=0))
    ids = idx.add(rng.standard_normal((1000, 16)).astype(np.float32))
    # delete 90% -> tombstone fraction crosses the compaction threshold
    idx.remove(ids[:900])
    st = idx.stats()
    assert st["tombstones"] < 0.5 * st["used_slots"], f"compaction did not run: {st}"
    assert len(idx) == 100
    keep = rng.standard_normal((16,)).astype(np.float32)
    assert isinstance(idx.search(keep, 3)[0], list)
