"""Tracing, timing, and per-operation statistics.

The reference has no in-library tracing — only CLI stopwatches
(``src/main.rs:146,153-160``) and indicatif progress bars (SURVEY.md §5).
This module is the upgrade the rebuild plan calls for: lightweight timing
context managers, optional ``jax.profiler`` traces for TPU timelines, and a
query-stats accumulator (candidates scanned, buckets probed, tombstones hit —
the observability the reference lacks entirely).
"""

from __future__ import annotations

import contextlib
import logging
import time
from dataclasses import dataclass, field

logger = logging.getLogger("zebra_tpu")


@dataclass
class OpStats:
    """Running counters for one operation kind."""

    calls: int = 0
    seconds: float = 0.0
    items: int = 0

    def rate(self) -> float:
        return self.items / self.seconds if self.seconds else 0.0


@dataclass
class Stats:
    """Per-database operation counters (attach via ``Database.stats``)."""

    ops: dict[str, OpStats] = field(default_factory=dict)

    def record(self, name: str, seconds: float, items: int = 0) -> None:
        s = self.ops.setdefault(name, OpStats())
        s.calls += 1
        s.seconds += seconds
        s.items += items

    def summary(self) -> dict[str, dict]:
        return {
            k: {"calls": v.calls, "seconds": round(v.seconds, 4),
                "items": v.items, "items_per_sec": round(v.rate(), 1)}
            for k, v in sorted(self.ops.items())
        }


GLOBAL_STATS = Stats()


@contextlib.contextmanager
def timed(name: str, items: int = 0, stats: Stats | None = None):
    """Time a block; records into ``stats`` (default: the global collector)
    and logs at DEBUG."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        (stats or GLOBAL_STATS).record(name, dt, items)
        logger.debug("%s: %.3fms (%d items)", name, dt * 1e3, items)


@contextlib.contextmanager
def device_trace(name: str):
    """Annotate a region in the TPU profiler timeline (no-op overhead when no
    trace is being captured)."""
    import jax.profiler

    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def capture_trace(log_dir: str):
    """Capture a full ``jax.profiler`` trace of the enclosed block for
    TensorBoard / xprof inspection."""
    import jax.profiler

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def query_plan_stats(state, num_probes: int) -> dict:
    """Static per-query work estimate for the current index shape — the
    'buckets probed / candidates scanned' observability knob."""
    T = state.num_tables
    cap = state.bucket_capacity
    return {
        "tables": T,
        "probes_per_table": num_probes,
        "buckets_probed": T * num_probes,
        "max_candidates": T * num_probes * cap,
        "bits": state.bits,
        "bucket_rows": state.num_rows,
    }
