"""Tensor-parallel embedding towers (parallel/towers.py, SURVEY §2(c)).

The TP tower must be numerically the SAME function as the single-device
tower — GSPMD only changes where the matmuls run. Tests run on the 8-device
virtual CPU mesh (conftest) with a (data=2, model=4) grid: 12 attention
heads / 4 = 3 heads per device, FFN 1536 / 4 = 384 lanes per device.
"""

import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from zebra_tpu.parallel.towers import (
    MODEL_AXIS,
    make_tower_mesh,
    shard_tower,
    tower_param_shardings,
)


@pytest.fixture(scope="module")
def mesh():
    return make_tower_mesh(n_model=4, n_data=2)


def test_mesh_shape(mesh):
    assert mesh.shape == {"data": 2, "model": 4}
    with pytest.raises(ValueError):
        make_tower_mesh(n_model=16)
    with pytest.raises(ValueError):
        make_tower_mesh(n_model=4, n_data=4)


def test_text_tower_tp_matches_single_device(mesh):
    from zebra_tpu.models.text import BGESmallEn15

    texts = [f"document number {i} about zebras".encode() for i in range(10)]
    base = BGESmallEn15(batch_size=8)
    tp = BGESmallEn15(batch_size=8, mesh=mesh)
    ref = base.embed_documents(texts)
    got = tp.embed_documents(texts)
    assert got.shape == ref.shape == (10, 384)
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=2e-5)


def test_text_params_actually_sharded(mesh):
    from zebra_tpu.models.text import BGESmallEn15

    tp = BGESmallEn15(batch_size=8, mesh=mesh)
    _, params = tp._forward()
    flat = {
        "/".join(str(getattr(k, "key", k)) for k in path): leaf
        for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]
    }
    # MLP in/out kernels split on the FFN axis
    fc1 = flat["layer0/fc1/kernel"]
    assert fc1.sharding.spec == P(None, MODEL_AXIS)
    assert fc1.addressable_shards[0].data.shape == (384, 1536 // 4)
    fc2 = flat["layer0/fc2/kernel"]
    assert fc2.sharding.spec == P(MODEL_AXIS, None)
    # attention q/k/v split on heads; out-projection splits its input heads
    q = flat["layer0/attn/query/kernel"]
    assert q.sharding.spec == P(None, MODEL_AXIS, None)
    assert q.addressable_shards[0].data.shape == (384, 12 // 4, 32)
    out = flat["layer0/attn/out/kernel"]
    assert out.sharding.spec == P(MODEL_AXIS, None, None)
    # replicated leaves stay replicated
    assert flat["ln_embed/scale"].sharding.spec == P()
    assert flat["tok_embed/embedding"].sharding.spec == P()


def test_vit_tower_tp_matches_single_device(mesh):
    from zebra_tpu.models.vit import embed_pixels

    rng = np.random.default_rng(0)
    pixels = rng.standard_normal((4, 224, 224, 3)).astype(np.float32)
    # embeddings_mean exercises the patch conv (replicated); encoder_cls
    # exercises the full 12-block TP attention+MLP stack
    for mode in ("embeddings_mean", "encoder_cls"):
        ref = embed_pixels(pixels, mode=mode)
        got = embed_pixels(pixels, mode=mode, mesh=mesh)
        assert got.shape == ref.shape == (4, 768)
        np.testing.assert_allclose(got, ref, atol=5e-4, rtol=5e-4)


def test_image_model_with_mesh(mesh):
    """VitImageModel end-to-end (decode -> preprocess -> TP tower)."""
    import io

    from PIL import Image

    from zebra_tpu.models.image import VitImageModel

    rng = np.random.default_rng(1)
    buf = io.BytesIO()
    Image.fromarray(rng.integers(0, 255, (64, 80, 3), dtype=np.uint8)).save(
        buf, format="PNG"
    )
    data = buf.getvalue()
    ref = VitImageModel(batch_size=4).embed_documents([data, data])
    got = VitImageModel(batch_size=4, mesh=mesh).embed_documents([data, data])
    np.testing.assert_allclose(got, ref, atol=5e-4, rtol=5e-4)
    np.testing.assert_allclose(got[0], got[1], atol=1e-6)


def test_audio_model_with_mesh(mesh):
    """VitAudioModel end-to-end (decode -> spectrogram -> TP tower)."""
    import io
    import wave

    from zebra_tpu.models.audio import VitAudioModel

    buf = io.BytesIO()
    w = wave.open(buf, "wb")
    w.setnchannels(1)
    w.setsampwidth(2)
    w.setframerate(16000)
    t = np.arange(16000)
    w.writeframes((np.sin(2 * np.pi * 440 * t / 16000) * 20000)
                  .astype(np.int16).tobytes())
    w.close()
    data = buf.getvalue()
    ref = VitAudioModel(batch_size=2).embed_documents([data])
    got = VitAudioModel(batch_size=2, mesh=mesh).embed_documents([data])
    np.testing.assert_allclose(got, ref, atol=5e-4, rtol=5e-4)


def test_shardings_cover_every_leaf(mesh):
    """tower_param_shardings returns a sharding for every param leaf and
    never invents axes a leaf cannot carry."""
    from zebra_tpu.models.text import _encoder

    _, params = _encoder(0)
    sh = tower_param_shardings(params, mesh)
    leaves_p, leaves_s = jax.tree.leaves(params), jax.tree.leaves(sh)
    assert len(leaves_p) == len(leaves_s)
    for leaf, s in zip(leaves_p, leaves_s):
        assert len(s.spec) <= np.ndim(leaf)
