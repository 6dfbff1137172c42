"""Weight-loader completeness + numerical parity with HF reference models.

Round-1 verdict item 6: every tensor of a real BGE/ViT checkpoint must be
consumed (zero unmapped), and the loaded tower must reproduce the HF
implementation's outputs. The reference runs real ONNX BGE weights
(``src/model/text.rs:15-24``) and HF-hub ViT safetensors
(``src/model/image.rs:60-64``)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# synthetic full checkpoints (exact HF names/shapes, random values)
# ---------------------------------------------------------------------------


def _bert_checkpoint(rng, layers=12, hidden=384, ffn=1536, vocab=30522, maxlen=512):
    t = {}
    t["embeddings.word_embeddings.weight"] = rng.standard_normal((vocab, hidden))
    t["embeddings.position_embeddings.weight"] = rng.standard_normal((maxlen, hidden))
    t["embeddings.token_type_embeddings.weight"] = rng.standard_normal((2, hidden))
    t["embeddings.LayerNorm.weight"] = rng.standard_normal((hidden,))
    t["embeddings.LayerNorm.bias"] = rng.standard_normal((hidden,))
    for i in range(layers):
        p = f"encoder.layer.{i}"
        for proj in ("query", "key", "value"):
            t[f"{p}.attention.self.{proj}.weight"] = rng.standard_normal((hidden, hidden))
            t[f"{p}.attention.self.{proj}.bias"] = rng.standard_normal((hidden,))
        t[f"{p}.attention.output.dense.weight"] = rng.standard_normal((hidden, hidden))
        t[f"{p}.attention.output.dense.bias"] = rng.standard_normal((hidden,))
        t[f"{p}.attention.output.LayerNorm.weight"] = rng.standard_normal((hidden,))
        t[f"{p}.attention.output.LayerNorm.bias"] = rng.standard_normal((hidden,))
        t[f"{p}.intermediate.dense.weight"] = rng.standard_normal((ffn, hidden))
        t[f"{p}.intermediate.dense.bias"] = rng.standard_normal((ffn,))
        t[f"{p}.output.dense.weight"] = rng.standard_normal((hidden, ffn))
        t[f"{p}.output.dense.bias"] = rng.standard_normal((hidden,))
        t[f"{p}.output.LayerNorm.weight"] = rng.standard_normal((hidden,))
        t[f"{p}.output.LayerNorm.bias"] = rng.standard_normal((hidden,))
    return {k: v.astype(np.float32) for k, v in t.items()}


def _vit_checkpoint(rng, layers=12, hidden=768, mlp=3072, tokens=197):
    t = {}
    t["embeddings.cls_token"] = rng.standard_normal((1, 1, hidden))
    t["embeddings.position_embeddings"] = rng.standard_normal((1, tokens, hidden))
    t["embeddings.patch_embeddings.projection.weight"] = rng.standard_normal((hidden, 3, 16, 16))
    t["embeddings.patch_embeddings.projection.bias"] = rng.standard_normal((hidden,))
    for i in range(layers):
        p = f"encoder.layer.{i}"
        for proj in ("query", "key", "value"):
            t[f"{p}.attention.attention.{proj}.weight"] = rng.standard_normal((hidden, hidden))
            t[f"{p}.attention.attention.{proj}.bias"] = rng.standard_normal((hidden,))
        t[f"{p}.attention.output.dense.weight"] = rng.standard_normal((hidden, hidden))
        t[f"{p}.attention.output.dense.bias"] = rng.standard_normal((hidden,))
        t[f"{p}.layernorm_before.weight"] = rng.standard_normal((hidden,))
        t[f"{p}.layernorm_before.bias"] = rng.standard_normal((hidden,))
        t[f"{p}.layernorm_after.weight"] = rng.standard_normal((hidden,))
        t[f"{p}.layernorm_after.bias"] = rng.standard_normal((hidden,))
        t[f"{p}.intermediate.dense.weight"] = rng.standard_normal((mlp, hidden))
        t[f"{p}.intermediate.dense.bias"] = rng.standard_normal((mlp,))
        t[f"{p}.output.dense.weight"] = rng.standard_normal((hidden, mlp))
        t[f"{p}.output.dense.bias"] = rng.standard_normal((hidden,))
    t["layernorm.weight"] = rng.standard_normal((hidden,))
    t["layernorm.bias"] = rng.standard_normal((hidden,))
    return {k: v.astype(np.float32) for k, v in t.items()}


def _flatten(params, prefix=""):
    out = {}
    for k, v in params.items():
        if isinstance(v, dict):
            out.update(_flatten(v, f"{prefix}{k}/"))
        else:
            out[f"{prefix}{k}"] = np.asarray(v)
    return out


def test_bert_loader_consumes_every_tensor(tmp_path, rng):
    from zebra_tpu.models import text as T

    ckpt = _bert_checkpoint(rng)
    path = str(tmp_path / "bge.npz")
    np.savez(path, **ckpt)

    model = T.BertEncoder()
    ids = jnp.zeros((1, T.SEQ_LEN), jnp.int32)
    attn = jnp.ones((1, T.SEQ_LEN), jnp.bool_)
    params0 = model.init(jax.random.PRNGKey(0), ids, attn)["params"]
    before = _flatten(jax.tree.map(np.array, params0))
    params, report = T.load_bert_weights(path, params0)
    assert report["problems"] == [], report["problems"]
    assert report["unused"] == [], report["unused"]
    assert report["mapped"] == len(ckpt)
    # every parameter tensor actually changed (checkpoint is random ≠ init)
    after = _flatten(params)
    unchanged = [k for k in before if np.array_equal(before[k], after[k])]
    assert unchanged == [], unchanged


@pytest.mark.parametrize("mode", ["encoder_cls", "embeddings_mean"])
def test_vit_loader_consumes_every_tensor(tmp_path, rng, mode):
    from zebra_tpu.models import vit as V

    ckpt = _vit_checkpoint(rng)
    path = str(tmp_path / "vit.npz")
    np.savez(path, **ckpt)

    model = V.VitTower(mode=mode)
    dummy = jnp.zeros((1, 224, 224, 3), jnp.float32)
    params0 = model.init(jax.random.PRNGKey(0), dummy)["params"]
    before = _flatten(jax.tree.map(np.array, params0))
    params, report = V.load_vit_weights(path, params0, mode=mode)
    assert report["problems"] == [], report["problems"]
    assert report["unused"] == [], report["unused"]
    after = _flatten(params)
    unchanged = [k for k in before if np.array_equal(before[k], after[k])]
    assert unchanged == [], unchanged
    if mode == "encoder_cls":
        assert report["mapped"] == len(ckpt)


# ---------------------------------------------------------------------------
# numerical parity vs HF transformers (random weights, CPU torch)
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_bert_parity_with_transformers(tmp_path):
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from zebra_tpu.models import text as T

    cfg = transformers.BertConfig(
        vocab_size=T.VOCAB, hidden_size=T.HIDDEN, num_hidden_layers=T.LAYERS,
        num_attention_heads=T.HEADS, intermediate_size=T.FFN,
        max_position_embeddings=T.MAX_LEN, hidden_act="gelu",
    )
    torch.manual_seed(0)
    hf = transformers.BertModel(cfg).eval()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    path = str(tmp_path / "bert_rand.npz")
    np.savez(path, **sd)

    rng = np.random.default_rng(1)
    ids = rng.integers(1000, 5000, (2, T.SEQ_LEN)).astype(np.int64)
    attn = np.ones((2, T.SEQ_LEN), dtype=np.int64)
    with torch.no_grad():
        ref = hf(torch.tensor(ids), attention_mask=torch.tensor(attn)).last_hidden_state[:, 0].numpy()
    ref = ref / np.linalg.norm(ref, axis=1, keepdims=True)

    model = T.BertEncoder()
    params0 = model.init(
        jax.random.PRNGKey(0), jnp.asarray(ids, jnp.int32), jnp.asarray(attn, bool)
    )["params"]
    params, report = T.load_bert_weights(path, params0)
    assert report["problems"] == [], report["problems"]
    ours = np.asarray(
        model.apply({"params": params}, jnp.asarray(ids, jnp.int32), jnp.asarray(attn, bool))
    )
    cos = np.sum(ours * ref, axis=1)
    assert np.all(cos > 0.9999), cos


@pytest.mark.slow
def test_vit_parity_with_transformers(tmp_path):
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from zebra_tpu.models import vit as V

    cfg = transformers.ViTConfig()  # defaults == vit-base-patch16-224
    torch.manual_seed(0)
    hf = transformers.ViTModel(cfg, add_pooling_layer=False).eval()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    path = str(tmp_path / "vit_rand.npz")
    np.savez(path, **sd)

    rng = np.random.default_rng(2)
    px = rng.standard_normal((2, 224, 224, 3)).astype(np.float32)
    with torch.no_grad():
        ref = hf(torch.tensor(px.transpose(0, 3, 1, 2))).last_hidden_state[:, 0].numpy()

    model = V.VitTower(mode="encoder_cls")
    params0 = model.init(jax.random.PRNGKey(0), jnp.asarray(px))["params"]
    params, report = V.load_vit_weights(path, params0, mode="encoder_cls")
    assert report["problems"] == [], report["problems"]
    ours = np.asarray(model.apply({"params": params}, jnp.asarray(px)))
    cos = np.sum(ours * ref, axis=1) / (
        np.linalg.norm(ours, axis=1) * np.linalg.norm(ref, axis=1)
    )
    assert np.all(cos > 0.9999), cos
    np.testing.assert_allclose(ours, ref, atol=5e-3, rtol=1e-3)
