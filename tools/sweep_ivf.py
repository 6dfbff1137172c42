"""IVF config sweep at the headline scale (1M x 768 cosine, one chip).

Builds one IVFIndex, then sweeps probe counts x rerank backends measuring
device QPS and recall@10 vs brute force. Run serially:
  nohup python -u tools/sweep_ivf.py > /tmp/sweep_ivf.log 2>&1 &
"""

import argparse
import faulthandler
import logging
import sys
import time

import numpy as np

faulthandler.dump_traceback_later(120, repeat=True)  # watchdog: where are we
logging.basicConfig(level=logging.INFO)

sys.path.insert(0, ".")
from zebra_tpu.utils import device_sync, enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp

from bench import make_data
from zebra_tpu.config import IndexOptions
from zebra_tpu.index import ivf as V
from zebra_tpu.index.ivf_host import IVFIndex

ap = argparse.ArgumentParser()
ap.add_argument("--n", type=int, default=1_000_000)
ap.add_argument("--dim", type=int, default=768)
ap.add_argument("--dtype", default="float32")
ap.add_argument("--clusters", type=int, default=0)
ap.add_argument("--capacity", type=int, default=0)
ap.add_argument("--spill", type=int, default=8)
ap.add_argument("--qbatch", default="1024",
                help="comma list of query batch sizes (one build, all sizes)")
ap.add_argument("--probes", default="4,8,16")
ap.add_argument("--reranks", default="xla,pallas")
ap.add_argument("--metric", default="cosine")
ap.add_argument("--dots", default="auto",
                help="comma list of rerank_dots: auto,highest,bf16,bf16x2,bf16x3")
ap.add_argument("--probe-sels", default="auto",
                help="comma list of probe_sel: auto,f32")
ap.add_argument("--fetches", default="auto",
                help="comma list of rerank_fetch: auto,tiles,block")
ap.add_argument("--refine", type=lambda v: v if v == "scan" else int(v),
                default=0,
                help="int8 residual refine: oversample factor, 'scan' "
                     "(stream the residual through the probe kernel), 0=off")
ap.add_argument("--true-recall", action="store_true",
                help="also score each config vs TRUE f32 neighbours (host oracle)")
ap.add_argument("--out", default="", help="write sweep rows as a JSON artifact")
args = ap.parse_args()

print("devices:", jax.devices(), flush=True)
n, dim = args.n, args.dim
data = make_data(n, dim, seed=0)
rng = np.random.default_rng(1)

idx = IVFIndex(
    dim=dim,
    metric=args.metric,
    options=IndexOptions(
        index_type="ivf",
        rerank="pallas",  # sizes _dev_dim for the kernel; backend chosen per query below
        num_clusters=args.clusters,
        cluster_capacity=args.capacity,
        spill=args.spill,
        dtype=args.dtype,
        refine=args.refine,
        seed=0,
    ),
)
t0 = time.perf_counter()
ids_list = idx.add(data)
device_sync(idx.state.vectors)
t_build = time.perf_counter() - t0
print(f"build: {t_build:.1f}s ({n/t_build:,.0f}/s)  stats={idx.stats()}", flush=True)

qbatches = [int(x) for x in str(args.qbatch).split(",")]
qmax = max(qbatches)
qsel = rng.permutation(n)[:qmax]
queries = data[qsel] + 0.05 * rng.standard_normal((qmax, dim)).astype(np.float32)
qp = np.zeros((qmax, idx._dev_dim), np.float32)
qp[:, :dim] = queries
qj = jnp.asarray(qp)

# ground truth on 256 queries
nrq = min(256, qmax)
t0 = time.perf_counter()
db_, sb, vb = V.brute_force(idx.state, qj[:nrq], 10, metric=args.metric)
device_sync(db_)
sb, vb = np.asarray(sb), np.asarray(vb)
truth = [set(sb[i][vb[i]].tolist()) for i in range(nrq)]
print(f"brute truth: {time.perf_counter()-t0:.1f}s", flush=True)

# optional TRUE f32 oracle (host-side): the in-slab brute force shares the
# slab's quantisation, so it cannot see quantisation-induced recall loss —
# this is the number the int8 refine tier exists to move.
truth_rows = None
if args.true_recall:
    t0 = time.perf_counter()
    qh = queries[:nrq]
    if args.metric == "cosine":
        dn = data / np.maximum(np.linalg.norm(data, axis=1, keepdims=True), 1e-30)
        qn2 = qh / np.maximum(np.linalg.norm(qh, axis=1, keepdims=True), 1e-30)
        sim = qn2 @ dn.T
        tr = np.argpartition(-sim, 10, axis=1)[:, :10]
    else:
        d2 = (
            np.sum(qh * qh, 1)[:, None] - 2.0 * (qh @ data.T)
            + np.sum(data * data, 1)[None, :]
        )
        tr = np.argpartition(d2, 10, axis=1)[:, :10]
    truth_rows = [set(tr[i].tolist()) for i in range(nrq)]
    row_of_id = {i: r for r, i in enumerate(ids_list)}
    print(f"f32 truth oracle: {time.perf_counter()-t0:.1f}s", flush=True)

rows = []
for P in [int(x) for x in args.probes.split(",")]:
    for rr in args.reranks.split(","):
        for dots in args.dots.split(","):
            for psel in args.probe_sels.split(","):
              for fetch in args.fetches.split(","):
                for qb in qbatches:
                    qjb = qj[:qb]
                    rk = rscan = 0
                    if args.dtype == "int8":
                        rk = idx.options.refine_k(10)
                        rscan = idx.options.refine_is_scan()
                    t0 = time.perf_counter()
                    try:
                        d, s, v = V.query(
                            idx.state, qjb, 10, metric=args.metric,
                            num_probes=P, rerank=rr, rerank_dots=dots,
                            probe_sel=psel, rerank_fetch=fetch, refine_k=rk,
                            refine_scan=rscan,
                        )
                        device_sync(d)
                    except Exception as e:  # OOM/compile: record, keep going
                        msg = str(e).splitlines()[0][:160]
                        print(f"P={P:3d} dots={dots:7s} qb={qb:6d}: "
                              f"FAILED {msg}", flush=True)
                        rows.append(dict(probes=P, rerank=rr, dots=dots,
                                         probe_sel=psel, fetch=fetch,
                                         qbatch=qb, error=msg))
                        continue
                    t_compile = time.perf_counter() - t0
                    iters = max(4, (20 * 1024) // qb)
                    t0 = time.perf_counter()
                    for _ in range(iters):
                        d, s, v = V.query(
                            idx.state, qjb, 10, metric=args.metric,
                            num_probes=P, rerank=rr, rerank_dots=dots,
                            probe_sel=psel, rerank_fetch=fetch, refine_k=rk,
                            refine_scan=rscan,
                        )
                    device_sync(d)
                    qps = qb * iters / (time.perf_counter() - t0)
                    nrb = min(nrq, qb)
                    sa, va = np.asarray(s[:nrb]), np.asarray(v[:nrb])
                    hits = sum(
                        len(set(sa[i][va[i]].tolist()) & truth[i])
                        for i in range(nrb)
                    )
                    recall = hits / (nrb * 10)
                    t_rec = None
                    if truth_rows is not None:
                        t_hits = 0
                        for i in range(nrb):
                            got = idx._slot_ids.take_list(
                                sa[i][va[i]].astype(np.int64)
                            )
                            t_hits += len(
                                {row_of_id[g] for g in got if g in row_of_id}
                                & truth_rows[i]
                            )
                        t_rec = t_hits / (nrb * 10)
                    print(
                        f"P={P:3d} rerank={rr:6s} dots={dots:7s} sel={psel:4s}"
                        f" fetch={fetch:5s} qb={qb:6d}: {qps:10,.0f} QPS"
                        f"  recall@10={recall:.4f}"
                        + (f"  truth={t_rec:.4f}" if t_rec is not None else "")
                        + f"  (compile {t_compile:.0f}s)",
                        flush=True,
                    )
                    rows.append(dict(
                        probes=P, rerank=rr, dots=dots, probe_sel=psel,
                        fetch=fetch, qbatch=qb, qps=round(qps, 1),
                        recall_at_10=round(recall, 4),
                        **({"recall_vs_f32_truth": round(t_rec, 4)}
                           if t_rec is not None else {}),
                    ))
if args.out:
    import json

    with open(args.out, "w") as f:
        json.dump(dict(
            n=n, dim=dim, metric=args.metric, dtype=args.dtype,
            refine=args.refine,
            qbatch=str(args.qbatch), build_seconds=round(t_build, 1),
            rows=rows,
        ), f, indent=1)
    print(f"wrote {args.out}", flush=True)
print("sweep done", flush=True)
