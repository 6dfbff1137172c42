"""System-codec bindings (native/codecs.py): libmpg123 mp3 + libvorbisfile
ogg-vorbis decode, verified three ways — against each other (the two files
are encodings of ONE recording), against the independent SDL_mixer decoder,
and for robustness on garbage/truncated input.

Reference scope: symphonia decodes these codecs natively
(``src/model/audio.rs:35-75``); these bindings are our native path.
"""

import os

import numpy as np
import pytest

from zebra_tpu.native import codecs


def _sample(ext: str):
    try:
        import pygame.examples
    except ImportError:
        return None
    p = os.path.join(
        os.path.dirname(pygame.examples.__file__), "data", f"house_lo.{ext}"
    )
    return p if os.path.exists(p) else None


def _aligned_corr(a: np.ndarray, b: np.ndarray) -> float:
    """Waveform correlation after removing the mp3 encoder-delay lead."""
    w = 1 << 16
    xc = np.fft.irfft(np.fft.rfft(a[:w]) * np.conj(np.fft.rfft(b[:w])))
    lag = int(np.argmax(xc))
    lag = lag if lag < w // 2 else lag - w
    if lag >= 0:
        a = a[lag:]
    else:
        b = b[-lag:]
    m = min(len(a), len(b))
    return float(np.corrcoef(a[:m], b[:m])[0, 1])


def test_sniffers():
    assert codecs.looks_like_mp3(b"ID3\x04rest")
    assert codecs.looks_like_mp3(bytes([0xFF, 0xFB, 0x90, 0x00]))
    assert not codecs.looks_like_mp3(b"RIFFxxxx")
    assert not codecs.looks_like_mp3(b"")
    assert codecs.looks_like_ogg(b"OggS\x00")
    assert not codecs.looks_like_ogg(b"fLaC")


def test_mp3_decodes_real_file():
    p = _sample("mp3")
    if p is None:
        pytest.skip("pygame sample files absent")
    if codecs._libmpg123() is None:
        pytest.skip("libmpg123 absent")
    with open(p, "rb") as f:
        out = codecs.decode_mp3(f.read())
    assert out is not None
    samples, rate = out
    assert rate in (8000, 11025, 12000, 16000, 22050, 24000, 32000, 44100, 48000)
    assert samples.dtype == np.float32 and samples.ndim == 1
    assert len(samples) > rate  # > 1s
    assert 0.05 < abs(samples).max() <= 2.0  # mpg123 floats can slightly clip


def test_ogg_decodes_real_file():
    p = _sample("ogg")
    if p is None:
        pytest.skip("pygame sample files absent")
    if codecs._libvorbisfile() is None:
        pytest.skip("libvorbisfile absent")
    with open(p, "rb") as f:
        out = codecs.decode_ogg(f.read())
    assert out is not None
    samples, rate = out
    assert rate > 0 and samples.dtype == np.float32
    assert len(samples) > rate
    assert 0.05 < abs(samples).max() <= 1.0


def test_mp3_and_ogg_agree_on_same_recording():
    pm, po = _sample("mp3"), _sample("ogg")
    if pm is None or po is None:
        pytest.skip("pygame sample files absent")
    if codecs._libmpg123() is None or codecs._libvorbisfile() is None:
        pytest.skip("system codec libs absent")
    with open(pm, "rb") as f:
        a, ra = codecs.decode_mp3(f.read())
    with open(po, "rb") as f:
        b, rb = codecs.decode_ogg(f.read())
    assert ra == rb  # same recording, same true rate (no resampling applied)
    assert _aligned_corr(a, b) > 0.95


def test_mp3_agrees_with_independent_sdl_decoder():
    """libmpg123 output must match SDL_mixer's own (independent) mp3
    decoder up to its resampling: compare at the coarser common grid."""
    p = _sample("mp3")
    if p is None:
        pytest.skip("pygame sample files absent")
    if codecs._libmpg123() is None:
        pytest.skip("libmpg123 absent")
    from zebra_tpu.models.audio import _decode_via_sdl_mixer

    with open(p, "rb") as f:
        data = f.read()
    sdl = _decode_via_sdl_mixer(data)
    if sdl is None:
        pytest.skip("pygame/SDL_mixer unavailable")
    a, ra = codecs.decode_mp3(data)
    b, rb = sdl
    assert rb % ra == 0, (ra, rb)  # SDL upsamples by an integer factor here
    b = b.reshape(-1, rb // ra).mean(axis=1)  # box-downsample to true rate
    assert _aligned_corr(a, b) > 0.9


@pytest.mark.parametrize("fn", [codecs.decode_mp3, codecs.decode_ogg])
def test_garbage_returns_none(fn):
    rng = np.random.default_rng(0)
    assert fn(rng.integers(0, 256, 4096).astype(np.uint8).tobytes()) is None
    assert fn(b"") is None


def test_truncated_streams_keep_prefix_or_fail_cleanly():
    pm = _sample("mp3")
    if pm is None or codecs._libmpg123() is None:
        pytest.skip("mp3 prerequisites absent")
    with open(pm, "rb") as f:
        data = f.read()
    out = codecs.decode_mp3(data[: len(data) // 4])
    # a truncated stream must either fail cleanly or return a shorter decode
    if out is not None:
        full = codecs.decode_mp3(data)
        assert len(out[0]) < len(full[0])


# -- ffmpeg catch-all shim (native/zebra_av.cpp) ------------------------------

#: (encoder, container) pairs for codecs with no sample files on this box;
#: the shim's TEST-ONLY encoder synthesizes a 440 Hz sine per codec
_AV_CODECS = [
    ("aac", "adts", 44100),
    ("libopus", "ogg", 48000),  # opus requires 48k; also tests ogg fall-through
    ("wmav2", "asf", 44100),
    ("alac", "ipod", 44100),  # m4a container
]


@pytest.mark.parametrize("codec,container,rate", _AV_CODECS,
                         ids=[c[0] for c in _AV_CODECS])
def test_av_shim_roundtrips_other_codecs(codec, container, rate):
    from zebra_tpu.native import av

    if not av.available():
        pytest.skip("ffmpeg libs/toolchain absent")
    blob = av.encode_test_tone(codec, container, rate=rate, n=rate, freq=440.0)
    if blob is None:
        pytest.skip(f"{codec} encoder not built into this ffmpeg")
    out = av.decode_any(blob)
    assert out is not None
    samples, out_rate = out
    assert out_rate == rate
    assert abs(len(samples) - rate) < rate // 4  # ~1s +/- codec padding
    spec = np.abs(np.fft.rfft(samples * np.hanning(len(samples))))
    peak_hz = np.argmax(spec) * out_rate / len(samples)
    assert abs(peak_hz - 440.0) < 5.0, peak_hz


def test_av_shim_matches_dedicated_decoders_on_mp3():
    p = _sample("mp3")
    if p is None:
        pytest.skip("pygame sample files absent")
    from zebra_tpu.native import av

    if not av.available() or codecs._libmpg123() is None:
        pytest.skip("ffmpeg or libmpg123 absent")
    with open(p, "rb") as f:
        data = f.read()
    a, ra = av.decode_any(data)
    b, rb = codecs.decode_mp3(data)
    assert ra == rb
    assert _aligned_corr(a, b) > 0.999  # same underlying decoder family


def test_av_shim_rejects_garbage_and_non_audio():
    from zebra_tpu.native import av

    if not av.available():
        pytest.skip("ffmpeg libs/toolchain absent")
    rng = np.random.default_rng(1)
    assert av.decode_any(rng.integers(0, 256, 8192).astype(np.uint8).tobytes()) is None
    # parseable NON-AUDIO media must not come back as audio
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (32, 32), (255, 0, 0)).save(buf, format="PNG")
    assert av.decode_any(buf.getvalue()) is None


def test_audio_to_data_decodes_aac_and_opus():
    """The model decode chain must handle codecs only the ffmpeg shim
    covers — including ogg-opus, which sniffs as ogg but is declined by
    libvorbisfile and must fall through."""
    from zebra_tpu.native import av

    if not av.available():
        pytest.skip("ffmpeg libs/toolchain absent")
    from zebra_tpu.models.audio import audio_to_data

    for codec, container, rate in [("aac", "adts", 44100),
                                   ("libopus", "ogg", 48000)]:
        blob = av.encode_test_tone(codec, container, rate=rate, n=rate)
        if blob is None:
            continue
        samples, out_rate = audio_to_data(blob)
        assert out_rate == rate and len(samples) > rate // 2


def test_audio_to_data_routes_through_system_codecs():
    """The model decode path must pick the system codec (true 11.025/44.1k
    rate), not the SDL fallback (which resamples to the mixer rate)."""
    pm = _sample("mp3")
    if pm is None or codecs._libmpg123() is None:
        pytest.skip("mp3 prerequisites absent")
    try:
        import soundfile  # noqa: F401

        pytest.skip("soundfile present — chain prefers system codecs anyway")
    except ImportError:
        pass
    from zebra_tpu.models.audio import audio_to_data

    with open(pm, "rb") as f:
        data = f.read()
    samples, rate = audio_to_data(data)
    direct, drate = codecs.decode_mp3(data)
    assert rate == drate
    np.testing.assert_allclose(samples, direct)
