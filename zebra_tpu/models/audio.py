"""Audio embedding: decode -> log-frequency spectrogram image -> ViT tower.

Reference pipeline (``src/model/audio.rs``): symphonia decodes any codec to
i16 samples (``:35-75``), sonogram renders a 512-bin spectrogram as a
224x224 "rainbow" PNG (``:86-99``), and that image goes through the same ViT
flow as real images (``:110-142``). TPU-native version: host decodes WAV
(std ``wave``; ``soundfile`` for other codecs when importable), the
spectrogram is a jit-compiled STFT -> log-magnitude -> log-frequency resample
on device, mapped to an ImageNet-normalised 3-channel image for the shared
ViT tower.
"""

from __future__ import annotations

import functools
import io
import wave

import jax
import jax.numpy as jnp
import numpy as np

from zebra_tpu.models.base import BaseModel, DIM_VIT_BASE_PATCH16_224
from zebra_tpu.models.image import IMAGENET_MEAN, IMAGENET_STD
from zebra_tpu.models.vit import IMAGE_SIZE, embed_pixels

N_FFT = 1024  # 512 frequency bins, matching the reference's 512-bin sonogram
TARGET_FRAMES = IMAGE_SIZE
TARGET_BINS = IMAGE_SIZE
MAX_SAMPLES = 16000 * 30  # cap at 30s @ 16kHz-equivalent to bound compile shapes


def _pcm_to_float(raw: bytes, width: int, channels: int, big_endian: bool) -> np.ndarray:
    dtype = {1: np.uint8, 2: np.int16, 4: np.int32}.get(width)
    if dtype is None:
        raise ValueError(f"unsupported PCM sample width {width}")
    arr = np.frombuffer(raw, dtype=dtype)
    if big_endian and width > 1:
        arr = arr.byteswap()
    samples = arr.astype(np.float32)
    if width == 1:
        samples = (samples - 128.0) / 128.0
    else:
        samples = samples / float(2 ** (8 * width - 1))
    if channels > 1:
        samples = samples.reshape(-1, channels).mean(axis=1)
    return samples


def audio_to_data(data: bytes) -> tuple[np.ndarray, int]:
    """Decode audio bytes to mono float32 samples + sample rate (reference
    ``audio_to_data``, ``src/model/audio.rs:35-75``).

    Native containers (stdlib): WAV, AIFF/AIFC, AU/SND; FLAC via the
    in-tree C++ decoder; mp3/ogg-vorbis via the system codec libraries
    (libmpg123 / libvorbisfile over ctypes, ``native/codecs.py``); every
    other codec (aac/m4a, opus, wma, alac, ...) via the ffmpeg shim
    (``native/zebra_av.cpp``). ``soundfile``/``pygame`` remain as last
    resorts for systems without those libs — the reference covers all of
    this via the symphonia crate."""
    try:
        with wave.open(io.BytesIO(data)) as w:
            raw = w.readframes(w.getnframes())
            return (
                _pcm_to_float(raw, w.getsampwidth(), w.getnchannels(), False),
                w.getframerate(),
            )
    except wave.Error:
        pass
    if data[:4] == b"FORM" and data[8:12] in (b"AIFF", b"AIFC"):
        import warnings

        try:
            with warnings.catch_warnings():
                warnings.simplefilter("ignore", DeprecationWarning)
                import aifc
        except ImportError:  # removed in Python 3.13 — try soundfile below
            aifc = None
        if aifc is not None:
            with aifc.open(io.BytesIO(data)) as a:
                raw = a.readframes(a.getnframes())
                # uncompressed (and 'sowt', which aifc byteswaps on read)
                # AIFF PCM arrives big-endian; compressed AIFC (ulaw/alaw)
                # decodes to NATIVE-endian linear samples — mirror the AU
                # branch's comptype check
                be = a.getcomptype() in (b"NONE", b"sowt")
                return (
                    _pcm_to_float(raw, a.getsampwidth(), a.getnchannels(), be),
                    int(a.getframerate()),
                )
    if data[:4] == b".snd":
        import warnings

        try:
            with warnings.catch_warnings():
                warnings.simplefilter("ignore", DeprecationWarning)
                import sunau
        except ImportError:  # removed in Python 3.13 — try soundfile below
            sunau = None
        if sunau is not None:
            with sunau.open(io.BytesIO(data)) as a:
                raw = a.readframes(a.getnframes())
                # uncompressed AU PCM is big-endian; mu-law frames come back
                # already decoded to NATIVE-endian linear samples
                be = a.getcomptype() == "NONE"
                return (
                    _pcm_to_float(raw, a.getsampwidth(), a.getnchannels(), be),
                    int(a.getframerate()),
                )
    if data[:4] == b"fLaC":  # native FLAC decoder (no external deps)
        from zebra_tpu.native.flac import decode_flac

        try:
            return decode_flac(data)
        except ValueError:
            pass  # corrupt stream or no toolchain — try soundfile below
    # lossy codecs via SYSTEM libraries first (true sample rates, zero
    # Python deps): mp3 -> libmpg123, ogg-vorbis -> libvorbisfile
    from zebra_tpu.native import codecs as _codecs

    if _codecs.looks_like_ogg(data):
        decoded = _codecs.decode_ogg(data)
        if decoded is not None:
            return decoded
    if _codecs.looks_like_mp3(data):
        decoded = _codecs.decode_mp3(data)
        if decoded is not None:
            return decoded
    # catch-all native decode (aac/m4a, opus, wma, alac, ...) via the
    # system ffmpeg libraries — also picks up ogg-opus streams the
    # vorbisfile path above declined
    from zebra_tpu.native import av as _av

    decoded = _av.decode_any(data)
    if decoded is not None:
        return decoded
    try:  # last resorts for systems without the ffmpeg libs
        import soundfile as sf
    except ImportError:
        sf = None
    if sf is not None:
        samples, rate = sf.read(io.BytesIO(data), dtype="float32", always_2d=True)
        return samples.mean(axis=1), int(rate)
    decoded = _decode_via_sdl_mixer(data)
    if decoded is not None:
        return decoded
    raise ValueError(
        "unsupported audio container (WAV/AIFF/AU/FLAC natively; mp3/ogg "
        "via system libmpg123/libvorbisfile; install `soundfile` or "
        "`pygame` for other compressed codecs)"
    )


_SDL_MIXER_RATE = 44100


def _decode_via_sdl_mixer(data: bytes) -> tuple[np.ndarray, int] | None:
    """Decode mp3/ogg-vorbis via SDL_mixer (bundled with ``pygame``), the
    no-soundfile fallback for the codecs the reference covers through
    symphonia (``src/model/audio.rs:35-75``). SDL_mixer resamples every
    stream to the mixer's init rate, so the returned rate is always
    ``_SDL_MIXER_RATE`` — exact for the spectrogram mapping, which only
    needs samples + their effective rate. Returns None when pygame is
    absent or the bytes aren't a codec SDL_mixer understands."""
    import os

    os.environ.setdefault("PYGAME_HIDE_SUPPORT_PROMPT", "1")
    os.environ.setdefault("SDL_AUDIODRIVER", "dummy")  # decode-only, headless
    try:
        import pygame
        import pygame.sndarray
    except ImportError:
        return None
    if not pygame.mixer.get_init():
        try:
            pygame.mixer.init(frequency=_SDL_MIXER_RATE, size=-16, channels=2)
        except pygame.error:
            return None
    try:
        snd = pygame.mixer.Sound(io.BytesIO(data))
    except pygame.error:
        return None
    arr = pygame.sndarray.array(snd)  # [n] or [n, channels] int16
    samples = arr.astype(np.float32) / 32768.0
    if samples.ndim > 1:
        samples = samples.mean(axis=1)
    rate = pygame.mixer.get_init()[0]
    return samples, int(rate)


@functools.lru_cache(maxsize=1)
def _spectrogram_fn():
    @jax.jit
    def spec(samples: jnp.ndarray):  # [MAX_SAMPLES] f32 (zero-padded)
        hop = (MAX_SAMPLES - N_FFT) // (TARGET_FRAMES - 1)
        starts = jnp.arange(TARGET_FRAMES) * hop
        idx = starts[:, None] + jnp.arange(N_FFT)[None, :]
        frames = samples[idx] * jnp.hanning(N_FFT)[None, :]
        mag = jnp.abs(jnp.fft.rfft(frames, axis=-1))[:, : N_FFT // 2]  # [F, 512]
        # log-frequency resample 512 -> 224 bins (reference sonogram uses a
        # log frequency axis, model/audio.rs:93)
        src = (jnp.logspace(0, jnp.log10(N_FFT // 2 - 1), TARGET_BINS)).astype(jnp.int32)
        logmag = jnp.log1p(mag[:, src])  # [F, 224]
        lo, hi = jnp.min(logmag), jnp.max(logmag)
        img = (logmag - lo) / jnp.maximum(hi - lo, 1e-6)
        return img.T[::-1]  # [224 bins, 224 frames], low freq at the bottom

    return spec


def audio_to_image_tensor224(data: bytes) -> np.ndarray:
    """Bytes -> ``[224, 224, 3]`` ImageNet-normalised spectrogram image
    (reference ``audio_to_image_tensor224``, ``src/model/audio.rs:86-100``)."""
    samples, _rate = audio_to_data(data)
    buf = np.zeros(MAX_SAMPLES, dtype=np.float32)
    take = min(len(samples), MAX_SAMPLES)
    buf[:take] = samples[:take]
    img = np.asarray(_spectrogram_fn()(jnp.asarray(buf)))  # [224, 224] in [0,1]
    rgb = np.repeat(img[:, :, None], 3, axis=2)
    return (rgb - IMAGENET_MEAN) / IMAGENET_STD


class VitAudioModel(BaseModel):
    """768-d audio embeddings: spectrogram image through the ViT tower
    (reference audio ``VitBasePatch16_224``, ``src/model/audio.rs:106-142``)."""

    dim = DIM_VIT_BASE_PATCH16_224
    name = "vit-audio"

    def __init__(self, mode: str = "embeddings_mean", batch_size: int = 16,
                 mesh=None):
        self.mode = mode
        self.batch_size = batch_size
        #: optional ("data", "model") Mesh for a tensor-parallel tower
        self.mesh = mesh

    def embed_documents(self, documents: list[bytes]) -> np.ndarray:
        out = np.empty((len(documents), self.dim), dtype=np.float32)
        for start in range(0, len(documents), self.batch_size):
            batch = documents[start : start + self.batch_size]
            pixels = np.zeros((self.batch_size, IMAGE_SIZE, IMAGE_SIZE, 3), np.float32)
            for i, d in enumerate(batch):
                pixels[i] = audio_to_image_tensor224(d)
            out[start : start + len(batch)] = embed_pixels(
                pixels, mode=self.mode, mesh=self.mesh
            )[: len(batch)]
        return out

    def status(self) -> dict:
        from zebra_tpu.models.vit import weight_status

        degr = weight_status(self.mode)
        from zebra_tpu.native import av as _av
        from zebra_tpu.native import codecs as _codecs

        have_lossy = _av.available() or (
            _codecs._libmpg123() is not None
            and _codecs._libvorbisfile() is not None
        )
        if not have_lossy:
            try:
                import soundfile  # noqa: F401
                have_lossy = True
            except ImportError:
                try:
                    import pygame  # noqa: F401  (SDL_mixer mp3/ogg fallback)
                    have_lossy = True
                except ImportError:
                    pass
        if not have_lossy:
            degr = degr + [
                "mp3/ogg codecs unavailable — install system "
                "libmpg123/libvorbisfile, the 'audio' extra (soundfile), "
                "or pygame; WAV/AIFF/AU/FLAC decode natively"
            ]
        return {"semantic": not degr, "degradations": degr}
