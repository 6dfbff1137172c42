"""Native FLAC decoder tests (zebra_tpu/native/zebra_flac.cpp).

Round-trips against the independent from-spec encoder in
``tests/flac_encoder.py``: every subframe type, residual variant, channel
assignment, and bit depth the format defines. Reference parity target:
symphonia's FLAC decode feeding ``audio_to_data``
(/root/reference/src/model/audio.rs:35-75).
"""

import numpy as np
import pytest

from tests.flac_encoder import encode_flac
from zebra_tpu.native import flac as nf

pytestmark = pytest.mark.skipif(
    not nf.available(), reason="native toolchain unavailable"
)


def roundtrip(samples, bps=16, rate=16000, **kw):
    data = encode_flac(samples, rate=rate, bps=bps, **kw)
    pcm, got_rate, ch, got_bps = nf.decode_flac_raw(data)
    assert got_rate == rate
    assert got_bps == bps
    s = np.asarray(samples, dtype=np.int64)
    if s.ndim == 1:
        s = s[:, None]
    assert ch == s.shape[1]
    np.testing.assert_array_equal(pcm.astype(np.int64), s)
    return data


def walk(n, lo, hi, seed=0, step=40):
    """Random-walk signal clipped to [lo, hi] — compresses under the fixed
    predictors like real audio does."""
    rng = np.random.default_rng(seed)
    return np.clip(np.cumsum(rng.integers(-step, step + 1, n)), lo, hi).astype(
        np.int64
    )


class TestSubframes:
    def test_constant_mono(self):
        roundtrip(np.full(512, -1234), blocksize=256)

    def test_verbatim_mono(self):
        rng = np.random.default_rng(1)
        roundtrip(
            rng.integers(-(2**15), 2**15, 300),
            blocksize=256,
            kind="verbatim",
        )

    @pytest.mark.parametrize("order", [0, 1, 2, 3, 4])
    def test_fixed_orders(self, order):
        roundtrip(
            walk(600, -(2**14), 2**14 - 1, seed=order),
            blocksize=256,
            kind="fixed",
            order=order,
        )

    def test_lpc(self):
        roundtrip(
            walk(512, -(2**14), 2**14 - 1, seed=9),
            blocksize=256,
            kind="lpc",
            lpc_coefs=[3 << 8, -(3 << 8), 1 << 8],
            lpc_shift=9,
            lpc_precision=12,
        )

    def test_lpc_order_32(self):
        coefs = [0] * 31 + [1 << 5]  # predicts x[i-32], shift 5
        roundtrip(
            walk(300, -(2**13), 2**13, seed=3),
            blocksize=256,
            kind="lpc",
            lpc_coefs=coefs,
            lpc_shift=5,
            lpc_precision=8,
        )

    def test_wasted_bits(self):
        s = walk(256, -(2**12), 2**12, seed=4) << 3
        roundtrip(s, blocksize=256, kind="fixed", order=1, wasted=3)


class TestResiduals:
    @pytest.mark.parametrize("po", [0, 1, 2, 3])
    def test_partition_orders(self, po):
        roundtrip(
            walk(512, -(2**14), 2**14, seed=po),
            blocksize=512,
            kind="fixed",
            order=2,
            partition_order=po,
        )

    def test_rice2(self):
        roundtrip(
            walk(256, -(2**14), 2**14, seed=5),
            blocksize=256,
            kind="fixed",
            order=1,
            rice2=True,
        )

    def test_escape_partitions(self):
        roundtrip(
            walk(512, -(2**14), 2**14, seed=6),
            blocksize=512,
            kind="fixed",
            order=2,
            partition_order=2,
            escape_parts=(1, 3),
        )


class TestChannels:
    def _stereo(self, seed=7, n=500):
        left = walk(n, -(2**14), 2**14, seed=seed)
        right = left + walk(n, -200, 200, seed=seed + 1)
        return np.stack([left, right], axis=1)

    def test_independent_stereo(self):
        roundtrip(self._stereo(), blocksize=256)

    @pytest.mark.parametrize("mode", ["left-side", "right-side", "mid-side"])
    def test_decorrelated_stereo(self, mode):
        roundtrip(self._stereo(), blocksize=256, mode=mode, kind="verbatim")

    @pytest.mark.parametrize("mode", ["left-side", "right-side", "mid-side"])
    def test_decorrelated_stereo_fixed(self, mode):
        roundtrip(self._stereo(seed=11), blocksize=256, mode=mode,
                  kind="fixed", order=2)

    def test_four_channels(self):
        rng = np.random.default_rng(12)
        roundtrip(rng.integers(-(2**15), 2**15, (256, 4)), blocksize=256,
                  kind="verbatim")


class TestDepthsAndSizes:
    @pytest.mark.parametrize("bps", [8, 12, 16, 20, 24, 32])
    def test_bit_depths(self, bps):
        roundtrip(
            walk(256, -(2 ** (bps - 1)), 2 ** (bps - 1) - 1, seed=bps,
                 step=1 << max(1, bps - 8)),
            bps=bps,
            blocksize=256,
        )

    @pytest.mark.parametrize("blocksize", [192, 256, 576, 1024])
    def test_coded_blocksizes(self, blocksize):
        roundtrip(walk(blocksize * 2, -(2**14), 2**14, seed=13),
                  blocksize=blocksize)

    def test_explicit_blocksize(self):
        # odd size forces the 8/16-bit explicit encodings (incl. final short
        # frame)
        roundtrip(walk(1000, -(2**14), 2**14, seed=14), blocksize=250)
        roundtrip(walk(900, -(2**14), 2**14, seed=15), blocksize=300)

    def test_many_frames(self):
        roundtrip(walk(4096, -(2**14), 2**14, seed=16), blocksize=256)


class TestRobustness:
    def test_not_flac(self):
        with pytest.raises(ValueError):
            nf.decode_flac_raw(b"RIFF" + b"\x00" * 64)

    def test_truncated(self):
        data = encode_flac(walk(512, -1000, 1000, seed=17), blocksize=256)
        with pytest.raises(ValueError):
            nf.decode_flac_raw(data[: len(data) // 2 - 3])

    def test_crc_corruption(self):
        data = bytearray(
            encode_flac(walk(512, -1000, 1000, seed=18), blocksize=256,
                        kind="verbatim")
        )
        data[-20] ^= 0x40  # flip a bit inside the last frame's payload
        with pytest.raises(ValueError):
            nf.decode_flac_raw(bytes(data))

    def test_float_downmix(self):
        left = np.full(256, 1 << 13, dtype=np.int64)
        right = np.zeros(256, dtype=np.int64)
        data = encode_flac(np.stack([left, right], axis=1), bps=16,
                           blocksize=256, kind="verbatim")
        mono, rate = nf.decode_flac(data)
        assert rate == 16000
        np.testing.assert_allclose(mono, np.full(256, 0.125, np.float32),
                                   rtol=1e-6)


class TestAudioPath:
    def test_audio_to_data_dispatch(self):
        from zebra_tpu.models.audio import audio_to_data

        s = walk(800, -(2**14), 2**14, seed=19)
        data = encode_flac(s, rate=8000, blocksize=256)
        samples, rate = audio_to_data(data)
        assert rate == 8000
        np.testing.assert_allclose(
            samples, s.astype(np.float32) / 2**15, atol=1e-6
        )
