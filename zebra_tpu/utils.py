"""Small host-side helpers shared across the package."""

from __future__ import annotations

import os
import secrets
import time


def enable_compile_cache(path: str = "") -> None:
    """Turn on JAX's persistent compilation cache (huge win where compiles go
    through a slow remote-compile service). Safe to call repeatedly."""
    import jax

    cache_dir = path or os.environ.get("JAX_COMPILATION_CACHE_DIR") or os.path.expanduser(
        "~/.cache/zebra_tpu_jax"
    )
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass


def next_pow2(n: int) -> int:
    n = max(1, int(n))
    return 1 << (n - 1).bit_length()


def device_sync(x) -> None:
    """TRUE device synchronization for timing.

    On this box's axon backend ``jax.block_until_ready`` returns immediately
    even with queued work (verified: an 8.8-TFLOP chain "blocks" in 0.1ms but
    takes ~0.3s to actually finish). The only reliable barrier is a readback,
    so force a 1-element transfer of (one leaf of) ``x``. Costs one tunnel
    round trip (~30ms here; microseconds on a local PCIe TPU) — amortise it
    over enough timed iterations.
    """
    import jax
    import numpy as np

    leaves = jax.tree.leaves(x)
    if leaves:
        np.asarray(leaves[0].reshape(-1)[:1])


def measure_tunnel(dim: int = 768) -> tuple[float, float]:
    """Measured host<->device bandwidth ``(up_MB/s, down_MB/s)``.

    Context for any wire-bound number (this box's dev tunnel swings 15-42
    MB/s up / 4-7 MB/s down between runs) and the input to bandwidth-aware
    policies like the checkpoint-fold threshold (round-3 verdict #7).
    Costs ~one second of transfers — cache the result per process (see
    :func:`device_readback_mbs`)."""
    import time

    import jax
    import numpy as np

    up_mb = 32
    host = np.random.default_rng(0).standard_normal(
        (up_mb * 1024 * 1024 // (4 * dim), dim)
    ).astype(np.float32)
    h = jax.device_put(host)  # warm any lazy init
    device_sync(h)
    t0 = time.perf_counter()
    h = jax.device_put(host)
    device_sync(h)
    up = up_mb / (time.perf_counter() - t0)
    down_rows = max((4 * 1024 * 1024) // (4 * dim), 1)
    t0 = time.perf_counter()
    _ = np.asarray(h[:down_rows])
    down = (down_rows * dim * 4 / 1e6) / (time.perf_counter() - t0)
    return round(up, 1), round(down, 1)


_READBACK_MBS: list[float] = []


def device_readback_mbs(measure: bool = True) -> float | None:
    """Device->host MB/s, measured ONCE per process and cached.

    ``measure=False`` never runs the probe on the calling thread and
    returns None while unmeasured — the fold policy consulted per mutation
    (under the write lock!) cannot afford the probe, which costs tens of
    seconds on a slow link; the background fold thread measures instead."""
    if not _READBACK_MBS:
        if not measure:
            return None
        _READBACK_MBS.append(measure_tunnel()[1])
    return max(_READBACK_MBS[0], 0.1)


def uuid7_bytes() -> bytes:
    """Time-ordered 16-byte id (UUIDv7 layout).

    Reference ids are ``Uuid::now_v7()`` (``src/database/index/lsh.rs:415``);
    time-ordering keeps newly inserted ids clustered, which helps the host-side
    id maps and makes on-disk blob listings chronological.
    """
    ms = time.time_ns() // 1_000_000
    rand = secrets.token_bytes(10)
    b = bytearray(16)
    b[0:6] = ms.to_bytes(6, "big")
    b[6] = 0x70 | (rand[0] & 0x0F)
    b[7] = rand[1]
    b[8] = 0x80 | (rand[2] & 0x3F)
    b[9:16] = rand[3:10]
    return bytes(b)


def uuid7_batch(n: int) -> list[bytes]:
    """Vectorised :func:`uuid7_bytes`: one urandom draw + numpy bit surgery
    instead of n per-id syscalls (matters at 65k-vector insert batches).

    MONOTONE within the batch (like the uuid crate's ``Uuid::now_v7``
    intra-millisecond counter the reference relies on, ``lsh.rs:415``): the
    12-bit rand_a field carries a sequence counter, overflowing into the
    millisecond timestamp every 4096 ids. Byte order of the ids therefore
    equals insert order — which deduplicate() uses as its keep-earliest rule.
    """
    import numpy as np

    if n <= 0:
        return []
    ms = time.time_ns() // 1_000_000
    seq = np.arange(n, dtype=np.int64)
    ms_i = ms + (seq >> 12)  # counter overflow rolls the timestamp forward
    ctr = (seq & 0xFFF).astype(np.uint16)
    arr = np.empty((n, 16), dtype=np.uint8)
    for b in range(6):  # big-endian 48-bit ms per row
        arr[:, b] = ((ms_i >> (8 * (5 - b))) & 0xFF).astype(np.uint8)
    rand = np.frombuffer(secrets.token_bytes(8 * n), dtype=np.uint8).reshape(n, 8)
    arr[:, 6] = 0x70 | (ctr >> 8).astype(np.uint8)
    arr[:, 7] = (ctr & 0xFF).astype(np.uint8)
    arr[:, 8] = 0x80 | (rand[:, 0] & 0x3F)
    arr[:, 9:16] = rand[:, 1:8]
    flat = arr.tobytes()
    return [flat[i * 16 : (i + 1) * 16] for i in range(n)]


def uuid_hex(b: bytes) -> str:
    return b.hex()


def fsync_write(path: str, data: bytes) -> None:
    """Write + flush + fsync — the reference persists with
    ``PersistMode::SyncAll`` on every upsert (``lsh.rs:87-89``); we match that
    durability at batch-operation granularity."""
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(data)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)
    # fsync the directory so the rename itself is durable
    dfd = os.open(os.path.dirname(os.path.abspath(path)) or ".", os.O_RDONLY)
    try:
        os.fsync(dfd)
    finally:
        os.close(dfd)


class Stopwatch:
    """Wall-clock timer for CLI reporting (reference uses the ``ticky``
    stopwatch crate, ``src/main.rs:146,153-160``)."""

    def __init__(self):
        self.t0 = time.perf_counter()

    def elapsed(self) -> float:
        return time.perf_counter() - self.t0

    def pretty(self) -> str:
        s = self.elapsed()
        if s < 1e-3:
            return f"{s * 1e6:.0f}µs"
        if s < 1:
            return f"{s * 1e3:.1f}ms"
        if s < 60:
            return f"{s:.2f}s"
        m, sec = divmod(s, 60.0)
        return f"{int(m)}m {sec:.1f}s"


class RWLock:
    """Reader-writer lock: queries share, mutations exclude.

    The reference serves concurrent multi-reader queries (rayon inside one
    search, DashMap across searches — ``core.rs:299-311``); a single mutex
    would meet that contract only in the trivial one-at-a-time sense. Writers
    are re-entrant (facade mutations call ``save()`` which is itself a write
    section) and are preferred over new readers to avoid writer starvation.
    A thread holding the write lock may enter read sections (treated as
    nested writes).
    """

    def __init__(self):
        import threading

        self._cond = threading.Condition()
        self._readers = 0
        self._writer: int | None = None
        self._depth = 0
        self._waiting_writers = 0

    def _me(self) -> int:
        import threading

        return threading.get_ident()

    def acquire_read(self) -> None:
        me = self._me()
        with self._cond:
            if self._writer == me:  # nested under our own write lock
                self._depth += 1
                return
            while self._writer is not None or self._waiting_writers:
                self._cond.wait()
            self._readers += 1

    def release_read(self) -> None:
        with self._cond:
            if self._writer == self._me():
                self._depth -= 1
                return
            self._readers -= 1
            if self._readers == 0:
                self._cond.notify_all()

    def acquire_write(self) -> None:
        me = self._me()
        with self._cond:
            if self._writer == me:
                self._depth += 1
                return
            self._waiting_writers += 1
            try:
                while self._writer is not None or self._readers:
                    self._cond.wait()
            finally:
                self._waiting_writers -= 1
            self._writer = me
            self._depth = 1

    def release_write(self) -> None:
        with self._cond:
            self._depth -= 1
            if self._depth == 0:
                self._writer = None
                self._cond.notify_all()

    def read(self):
        return _LockCtx(self.acquire_read, self.release_read)

    def write(self):
        return _LockCtx(self.acquire_write, self.release_write)


class _LockCtx:
    __slots__ = ("_enter", "_exit")

    def __init__(self, enter, exit):
        self._enter = enter
        self._exit = exit

    def __enter__(self):
        self._enter()

    def __exit__(self, *exc):
        self._exit()
