"""ViT-base-patch16-224 in Flax — the image/audio embedding tower.

Reference: candle's ``vit-base-patch16-224`` loaded from the HF hub, of which
only the *embeddings* layer (patch projection + CLS + position embeddings) is
executed (``src/model/image.rs:65-72``). The reference then flattens the
``[1, 197, 768]`` output into a 768-float buffer — which silently fails and
yields a zero vector (``model/image.rs:78-81``, SURVEY.md §2 note). We treat
the *intent* — one 768-d embedding per image — as the spec:

  mode="embeddings_mean": mean over the 197 embedding tokens (the fixed
      version of what the reference actually computes; no encoder needed)
  mode="encoder_cls":     full 12-block encoder, CLS token (the semantically
      useful tower when real weights are available)
  mode="encoder_mean":    full encoder, mean pool

Weights load from a local HF-style checkpoint when available (zero-egress
environments fall back to deterministic random init — still a valid LSH
embedding space, just not a semantic one).
"""

from __future__ import annotations

import functools
import os

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

IMAGE_SIZE = 224
PATCH = 16
HIDDEN = 768
LAYERS = 12
HEADS = 12
MLP = 3072
TOKENS = (IMAGE_SIZE // PATCH) ** 2 + 1  # 197


class VitEmbeddings(nn.Module):
    """Patch projection + CLS token + learned position embeddings."""

    @nn.compact
    def __call__(self, pixels):  # [n, 224, 224, 3] NHWC
        n = pixels.shape[0]
        patches = nn.Conv(
            HIDDEN, (PATCH, PATCH), strides=(PATCH, PATCH), name="patch_embed"
        )(pixels)  # [n, 14, 14, 768]
        patches = patches.reshape(n, -1, HIDDEN)
        cls = self.param("cls", nn.initializers.normal(0.02), (1, 1, HIDDEN))
        pos = self.param("pos", nn.initializers.normal(0.02), (1, TOKENS, HIDDEN))
        x = jnp.concatenate([jnp.broadcast_to(cls, (n, 1, HIDDEN)), patches], axis=1)
        return x + pos


class VitBlock(nn.Module):
    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(name="ln1")(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=HEADS, qkv_features=HIDDEN, name="attn"
        )(h, h)
        x = x + h
        h = nn.LayerNorm(name="ln2")(x)
        h = nn.Dense(MLP, name="fc1")(h)
        h = nn.gelu(h)
        h = nn.Dense(HIDDEN, name="fc2")(h)
        return x + h


class VitTower(nn.Module):
    mode: str = "embeddings_mean"

    @nn.compact
    def __call__(self, pixels):  # [n, 224, 224, 3] -> [n, 768]
        x = VitEmbeddings(name="embeddings")(pixels)
        if self.mode == "embeddings_mean":
            return jnp.mean(x, axis=1)
        for i in range(LAYERS):
            x = VitBlock(name=f"block{i}")(x)
        x = nn.LayerNorm(name="ln_final")(x)
        if self.mode == "encoder_cls":
            return x[:, 0]
        return jnp.mean(x, axis=1)


@functools.lru_cache(maxsize=4)
def _tower_and_params(mode: str, seed: int = 0):
    model = VitTower(mode=mode)
    dummy = jnp.zeros((1, IMAGE_SIZE, IMAGE_SIZE, 3), jnp.float32)
    weights_path = os.environ.get("ZEBRA_TPU_VIT_WEIGHTS", "")
    params = model.init(jax.random.PRNGKey(seed), dummy)["params"]
    if weights_path and os.path.exists(weights_path):
        params = _load_hf_weights(weights_path, params)
    apply_fn = jax.jit(lambda p, x: model.apply({"params": p}, x))
    return apply_fn, params


def _load_hf_weights(path: str, params):
    """Map a local ``google/vit-base-patch16-224`` checkpoint onto our tree.

    Best effort: any tensor that can't be mapped keeps its random init.
    """
    try:
        import safetensors.numpy as st

        raw = st.load_file(path)
    except Exception:
        try:
            raw = dict(np.load(path))
        except Exception:
            return params
    params = jax.tree.map(np.asarray, params)

    def put(dst_keys, value):
        node = params
        for k in dst_keys[:-1]:
            node = node[k]
        if node[dst_keys[-1]].shape == value.shape:
            node[dst_keys[-1]] = value

    for name, v in raw.items():
        if name.endswith("embeddings.cls_token"):
            put(["embeddings", "cls"], v)
        elif name.endswith("embeddings.position_embeddings"):
            put(["embeddings", "pos"], v)
        elif "patch_embeddings.projection.weight" in name:
            put(["embeddings", "patch_embed", "kernel"], np.transpose(v, (2, 3, 1, 0)))
        elif "patch_embeddings.projection.bias" in name:
            put(["embeddings", "patch_embed", "bias"], v)
    return params


def embed_pixels(pixels: np.ndarray, mode: str = "embeddings_mean", seed: int = 0):
    """``[n, 224, 224, 3]`` float32 (ImageNet-normalised) -> ``[n, 768]``."""
    apply_fn, params = _tower_and_params(mode, seed)
    return np.asarray(apply_fn(params, jnp.asarray(pixels)))
