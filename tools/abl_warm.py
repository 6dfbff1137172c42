"""Cold-build variance ablation: k-means AOT warm ON vs OFF on the axon
backend (round-4 verdict weak #5 / do-this #6).

The background warm (`ivf_host._start_kmeans_warm`) AOT-compiles the exact
k-means program the cold build is about to run, overlapping the staging
transfers. It is gated OFF for the axon backend unless ZEBRA_KMEANS_WARM
is set, on the theory that an extra in-flight remote compile entangles
with the compile service's stall episodes — a defensible call made with
ZERO data on the only hardware the feature targets. This tool records the
data.

Design constraints that shaped it:
* A build's compiles are cached BOTH in the persistent cache dir AND in
  the process's in-memory executable cache — so every build runs in a
  FRESH SUBPROCESS with a FRESH cache dir (verified: in one process,
  build 2 reuses in-memory executables regardless of cache dir).
* Single build times on this box swing up to 4x with tunnel/compile-
  service weather (CLAUDE.md) — so multiple builds per arm + spread are
  recorded, never one number per arm.
* The final "cache_warm" build reuses the last build's cache dir in yet
  another fresh process: the consecutive-build stability number the
  round-4 verdict asks for ("two consecutive default-config cold builds
  within 1.5x of each other").

Run serially on the TPU box:
    nohup python -u tools/abl_warm.py --out bench_results/r5_warm_ablation.json \
        > /tmp/abl_warm.log 2>&1 &
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def child(args) -> None:
    """One cold build in this (fresh) process; prints one JSON line."""
    import time

    sys.path.insert(0, REPO)
    from bench import make_data

    from zebra_tpu.config import IndexOptions
    from zebra_tpu.index import make_index
    from zebra_tpu.profiling import GLOBAL_STATS
    from zebra_tpu.utils import device_sync, enable_compile_cache

    enable_compile_cache(os.environ["ABL_CACHE_DIR"])
    data = make_data(args.n, args.dim, seed=args.seed)
    idx = make_index(
        dim=args.dim, metric="cosine",
        options=IndexOptions(index_type="ivf", seed=args.seed),
    )
    t0 = time.perf_counter()
    idx.add(data)
    device_sync(idx.state.vectors)
    dt = time.perf_counter() - t0
    train_s = round(GLOBAL_STATS.summary().get("ivf.train", {}).get("seconds", 0.0), 2)
    print(json.dumps({"build_s": round(dt, 2), "train_s": train_s}), flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=500_000)
    ap.add_argument("--dim", type=int, default=768)
    ap.add_argument("--builds", type=int, default=2)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--child", action="store_true")
    ap.add_argument("--out", default="bench_results/r5_warm_ablation.json")
    args = ap.parse_args()
    if args.child:
        return child(args)

    def run_build(arm: str, b: int, cache_dir: str, warm: bool) -> dict:
        env = {**os.environ, "ABL_CACHE_DIR": cache_dir}
        env.pop("ZEBRA_KMEANS_WARM", None)
        if warm:
            env["ZEBRA_KMEANS_WARM"] = "1"
        cmd = [sys.executable, "-u", os.path.abspath(__file__), "--child",
               "--n", str(args.n), "--dim", str(args.dim),
               "--seed", str(args.seed)]
        out = subprocess.run(
            cmd, env=env, cwd=REPO, capture_output=True, text=True,
            timeout=7200,
        )
        line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else ""
        try:
            rec = json.loads(line)
        except Exception:
            print(out.stdout[-2000:], out.stderr[-2000:], file=sys.stderr)
            raise RuntimeError(f"{arm} build {b} produced no result")
        print(f"{arm} build {b}: {rec['build_s']:.1f}s "
              f"(train {rec['train_s']}s)", flush=True)
        return rec

    arms = {}
    last_cache = None
    for arm, warm in (("warm_off", False), ("warm_on", True)):
        builds = []
        for b in range(args.builds):
            last_cache = tempfile.mkdtemp(prefix=f"ablwarm_{arm}_")
            builds.append(run_build(arm, b, last_cache, warm))
        times = [x["build_s"] for x in builds]
        arms[arm] = {
            "builds": builds,
            "median_s": round(sorted(times)[len(times) // 2], 2),
            "spread": round(max(times) / max(min(times), 1e-9), 2),
        }
    # consecutive-build stability: fresh process, the last build's now-warm
    # persistent cache
    stable = run_build("cache_warm", 0, last_cache, warm=False)
    prior = arms["warm_on"]["builds"][-1]["build_s"]
    arms["cache_warm_rebuild"] = {
        **stable,
        "vs_prior_build_ratio": round(
            max(stable["build_s"], prior) / max(min(stable["build_s"], prior), 1e-9), 2,
        ),
    }
    result = {
        "metric": f"cold_build_warm_ablation_{args.n}x{args.dim}",
        "value": arms["warm_on"]["median_s"],
        "unit": "s",
        "vs_baseline": 0.0,
        "extra": {**arms, "builds_per_arm": args.builds, "n": args.n,
                  "dim": args.dim},
    }
    line = json.dumps(result)
    print(line, flush=True)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
