"""Minimal FLAC *encoder* used to generate test fixtures for the native
decoder (``zebra_tpu/native/zebra_flac.cpp``).

Written from the public FLAC format spec (RFC 9639), independent of the
decoder's code paths: it drives every decoder feature — CONSTANT / VERBATIM
/ FIXED / LPC subframes, Rice + Rice2 partitioned residuals with raw-bit
escapes, wasted bits, all four channel assignments, coded and explicit
block sizes, and frame CRC-8/16. No external deps; this environment has no
``flac``/``ffmpeg``/``soundfile`` to cross-check against, so round-trip
tests are the verification strategy (plus hand-built golden bitstreams in
``test_flac.py``).
"""

from __future__ import annotations

import numpy as np


class BitWriter:
    def __init__(self):
        self.bytes = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, nbits: int) -> None:
        assert nbits >= 0
        value &= (1 << nbits) - 1 if nbits else 0
        self.acc = (self.acc << nbits) | value
        self.nbits += nbits
        while self.nbits >= 8:
            self.nbits -= 8
            self.bytes.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_signed(self, value: int, nbits: int) -> None:
        self.write(value & ((1 << nbits) - 1), nbits)

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zeros then a one

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def data(self) -> bytes:
        assert self.nbits == 0, "must be byte-aligned"
        return bytes(self.bytes)


def crc8(data: bytes) -> int:
    c = 0
    for byte in data:
        c ^= byte
        for _ in range(8):
            c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
    return c


def crc16(data: bytes) -> int:
    c = 0
    for byte in data:
        c ^= byte << 8
        for _ in range(8):
            c = ((c << 1) ^ 0x8005) & 0xFFFF if c & 0x8000 else (c << 1) & 0xFFFF
    return c


def _utf8_num(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    for extra, lead, cap in (
        (1, 0xC0, 1 << 11),
        (2, 0xE0, 1 << 16),
        (3, 0xF0, 1 << 21),
        (4, 0xF8, 1 << 26),
        (5, 0xFC, 1 << 31),
        (6, 0xFE, 1 << 36),
    ):
        if n < cap:
            shift = 6 * extra
            out = [lead | (n >> shift)] if lead != 0xFE else [0xFE]
            for i in range(extra):
                shift -= 6
                out.append(0x80 | ((n >> shift) & 0x3F))
            return bytes(out)
    raise ValueError("frame number too large")


FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}

#: explicit-blocksize sentinel accepted by :func:`encode_frame`
BS_CODES = {192: 1, 576: 2, 1152: 3, 2304: 4, 4608: 5,
            256: 8, 512: 9, 1024: 10, 2048: 11, 4096: 12,
            8192: 13, 16384: 14, 32768: 15}


def _zigzag(r: np.ndarray) -> np.ndarray:
    return np.where(r >= 0, 2 * r, -2 * r - 1).astype(np.int64)


def _write_residual(bw: BitWriter, resid: np.ndarray, order: int,
                    blocksize: int, partition_order: int = 0,
                    rice2: bool = False, escape_parts=()) -> None:
    """Rice-coded partitioned residual. ``escape_parts``: partition indices
    forced to the raw-bits escape encoding."""
    bw.write(1 if rice2 else 0, 2)
    pbits = 5 if rice2 else 4
    escape = 0x1F if rice2 else 0xF
    bw.write(partition_order, 4)
    nparts = 1 << partition_order
    assert blocksize % nparts == 0
    idx = 0
    for p in range(nparts):
        count = blocksize // nparts - (order if p == 0 else 0)
        part = resid[idx : idx + count]
        idx += count
        if p in escape_parts:
            bw.write(escape, pbits)
            raw = int(max(1, int(np.abs(part).max()) if len(part) else 1)).bit_length() + 1
            bw.write(raw, 5)
            for v in part:
                bw.write_signed(int(v), raw)
            continue
        # pick a reasonable rice parameter
        zz = _zigzag(part)
        mean = float(zz.mean()) if len(zz) else 0.0
        k = 0
        while (1 << (k + 1)) < mean + 1 and k < escape - 1:
            k += 1
        bw.write(k, pbits)
        for u in zz:
            u = int(u)
            bw.write_unary(u >> k)
            if k:
                bw.write(u & ((1 << k) - 1), k)


def _write_subframe(bw: BitWriter, samples: np.ndarray, sbps: int,
                    kind: str = "auto", order: int = 2,
                    partition_order: int = 0, rice2: bool = False,
                    escape_parts=(), wasted: int = 0,
                    lpc_coefs=None, lpc_shift: int = 0,
                    lpc_precision: int = 12) -> None:
    """One subframe. ``samples`` must already fit in ``sbps`` signed bits."""
    blocksize = len(samples)
    s = np.asarray(samples, dtype=np.int64)
    if wasted:
        assert not np.any(s & ((1 << wasted) - 1)), "wasted bits must be zero"
        s = s >> wasted
    ebps = sbps - wasted

    if kind == "auto":
        if np.all(s == s[0]):
            kind = "constant"
        else:
            kind = "fixed"

    bw.write(0, 1)  # pad
    if kind == "constant":
        bw.write(0b000000, 6)
    elif kind == "verbatim":
        bw.write(0b000001, 6)
    elif kind == "fixed":
        bw.write(0b001000 | order, 6)
    elif kind == "lpc":
        order = len(lpc_coefs)
        bw.write(0b100000 | (order - 1), 6)
    else:
        raise ValueError(kind)
    if wasted:
        bw.write(1, 1)
        bw.write_unary(wasted - 1)
    else:
        bw.write(0, 1)

    if kind == "constant":
        bw.write_signed(int(s[0]), ebps)
        return
    if kind == "verbatim":
        for v in s:
            bw.write_signed(int(v), ebps)
        return

    # warmup
    for v in s[:order]:
        bw.write_signed(int(v), ebps)
    if kind == "lpc":
        bw.write(lpc_precision - 1, 4)
        bw.write_signed(lpc_shift, 5)
        for c in lpc_coefs:
            bw.write_signed(int(c), lpc_precision)
        coefs = np.asarray(lpc_coefs, dtype=np.int64)
        resid = np.empty(blocksize - order, dtype=np.int64)
        for i in range(order, blocksize):
            pred = int(np.dot(coefs, s[i - order : i][::-1])) >> lpc_shift
            resid[i - order] = int(s[i]) - pred
    else:
        coefs = np.asarray(FIXED_COEFS[order], dtype=np.int64)
        resid = np.empty(blocksize - order, dtype=np.int64)
        for i in range(order, blocksize):
            pred = int(np.dot(coefs, s[i - order : i][::-1])) if order else 0
            resid[i - order] = int(s[i]) - pred
    _write_residual(bw, resid, order, blocksize, partition_order, rice2,
                    escape_parts)


def encode_frame(channels: list[np.ndarray], frame_idx: int, bps: int,
                 mode: str = "independent", explicit_blocksize: bool = False,
                 **subframe_kw) -> bytes:
    """One FLAC frame. ``channels`` are the final (left, right, ...) PCM.

    mode: independent | left-side | right-side | mid-side (stereo only).
    """
    blocksize = len(channels[0])
    bw = BitWriter()
    bw.write(0b11111111111110, 14)
    bw.write(0, 1)  # reserved
    bw.write(0, 1)  # fixed-blocksize stream
    if not explicit_blocksize and blocksize in BS_CODES:
        bs_code, bs_extra = BS_CODES[blocksize], None
    elif blocksize <= 256:
        bs_code, bs_extra = 6, (blocksize - 1, 8)
    else:
        bs_code, bs_extra = 7, (blocksize - 1, 16)
    bw.write(bs_code, 4)
    bw.write(0, 4)  # sample rate: from STREAMINFO
    if mode == "independent":
        bw.write(len(channels) - 1, 4)
        sub = list(channels)
        side = -1
    else:
        assert len(channels) == 2
        left = np.asarray(channels[0], dtype=np.int64)
        right = np.asarray(channels[1], dtype=np.int64)
        s = left - right
        if mode == "left-side":
            bw.write(0b1000, 4)
            sub, side = [left, s], 1
        elif mode == "right-side":
            bw.write(0b1001, 4)
            sub, side = [s, right], 0
        elif mode == "mid-side":
            bw.write(0b1010, 4)
            sub, side = [(left + right) >> 1, s], 1
        else:
            raise ValueError(mode)
    bw.write(0, 3)  # sample size: from STREAMINFO
    bw.write(0, 1)  # reserved
    for b in _utf8_num(frame_idx):
        bw.write(b, 8)
    if bs_extra is not None:
        bw.write(*bs_extra)
    header = bw.data()
    bw.bytes.append(crc8(header))

    for i, ch in enumerate(sub):
        _write_subframe(bw, np.asarray(ch, dtype=np.int64),
                        bps + (1 if i == side else 0), **subframe_kw)
    bw.align()
    body = bw.data()
    bw.write(crc16(body), 16)
    return bw.data()


def encode_flac(samples: np.ndarray, rate: int = 16000, bps: int = 16,
                blocksize: int = 256, mode: str = "independent",
                **subframe_kw) -> bytes:
    """Full FLAC stream: STREAMINFO + frames. ``samples`` is [n] or [n, ch]
    int PCM at ``bps`` signed bits."""
    s = np.asarray(samples, dtype=np.int64)
    if s.ndim == 1:
        s = s[:, None]
    n, nch = s.shape

    out = bytearray(b"fLaC")
    si = BitWriter()
    si.write(blocksize, 16)  # min block
    si.write(blocksize, 16)  # max block
    si.write(0, 24)  # min frame size unknown
    si.write(0, 24)  # max frame size unknown
    si.write(rate, 20)
    si.write(nch - 1, 3)
    si.write(bps - 1, 5)
    si.write(n, 36)
    info = si.data() + b"\x00" * 16  # md5 unset
    out += bytes([0x80]) + len(info).to_bytes(3, "big") + info  # last-block

    idx = 0
    frame = 0
    while idx < n:
        block = s[idx : idx + blocksize]
        out += encode_frame([block[:, c] for c in range(nch)], frame, bps,
                            mode=mode if nch == 2 else "independent",
                            **subframe_kw)
        idx += blocksize
        frame += 1
    return bytes(out)
