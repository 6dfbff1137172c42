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


LN_EPS = 1e-12  # HF ViTConfig.layer_norm_eps


class VitBlock(nn.Module):
    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(name="ln1", epsilon=LN_EPS)(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=HEADS, qkv_features=HIDDEN, name="attn"
        )(h, h)
        x = x + h
        h = nn.LayerNorm(name="ln2", epsilon=LN_EPS)(x)
        h = nn.Dense(MLP, name="fc1")(h)
        h = nn.gelu(h, approximate=False)  # HF ViT uses exact erf GELU
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
        x = nn.LayerNorm(name="ln_final", epsilon=LN_EPS)(x)
        if self.mode == "encoder_cls":
            return x[:, 0]
        return jnp.mean(x, axis=1)


#: per-mode weight-load health ("loaded"/"partial"/"random"), surfaced by
#: the image/audio models' status() -> Database.model_status() -> CLI
WEIGHT_STATUS: dict[str, str] = {}


def _resolve_weights_path() -> str:
    """Env var first, then the ``fetch-weights`` cache (see
    :mod:`zebra_tpu.models.fetch`; ≙ candle's hf-hub pull,
    ``model/image.rs:60-64``)."""
    env = os.environ.get("ZEBRA_TPU_VIT_WEIGHTS", "")
    if env:
        return env
    from zebra_tpu.models.fetch import cached_weights

    return cached_weights("vit") or ""


@functools.lru_cache(maxsize=4)
def _tower_and_params(mode: str, seed: int = 0):
    from zebra_tpu.profiling import logger

    model = VitTower(mode=mode)
    dummy = jnp.zeros((1, IMAGE_SIZE, IMAGE_SIZE, 3), jnp.float32)
    weights_path = _resolve_weights_path()
    params = model.init(jax.random.PRNGKey(seed), dummy)["params"]
    if weights_path and os.path.exists(weights_path):
        params, report = load_vit_weights(weights_path, params, mode=mode)
        if report["problems"]:
            logger.warning(
                "vit checkpoint %s: %d tensors NOT mapped (random init "
                "remains!): %s", weights_path, len(report["problems"]),
                report["problems"][:8],
            )
            WEIGHT_STATUS[mode] = "partial"
        else:
            logger.info("vit: loaded %d tensors from %s", report["mapped"], weights_path)
            WEIGHT_STATUS[mode] = "loaded"
    else:
        if weights_path:
            logger.warning(
                "ZEBRA_TPU_VIT_WEIGHTS=%s does not exist — random init", weights_path
            )
        WEIGHT_STATUS[mode] = "random"
    apply_fn = jax.jit(lambda p, x: model.apply({"params": p}, x))
    return apply_fn, params


def weight_status(mode: str, seed: int = 0) -> list[str]:
    """Degradation strings for a tower mode (builds the cached tower)."""
    _tower_and_params(mode, seed)
    st = WEIGHT_STATUS.get(mode, "random")
    if st == "random":
        return [
            "random-init ViT weights (run `zebra-tpu fetch-weights vit` on "
            "a connected machine, or set ZEBRA_TPU_VIT_WEIGHTS to a "
            "model.safetensors checkpoint)"
        ]
    if st == "partial":
        return ["ViT checkpoint only partially mapped (see log)"]
    return []


#: checkpoint tensors legitimately unused by our pooling modes
_VIT_IGNORED_PREFIXES = ("pooler.", "classifier.")


def load_vit_weights(path: str, params, mode: str = "encoder_cls"):
    """Map the FULL ``google/vit-base-patch16-224`` parameter set onto our
    tree (reference downloads the same safetensors from the HF hub,
    ``src/model/image.rs:60-64``). Returns ``(params, report)``; tests assert
    ``report["problems"] == []`` and ``report["unused"] == []``.

    ``mode="embeddings_mean"`` only instantiates the embeddings layer (what
    the reference actually executes, ``image.rs:65-72``) — encoder tensors are
    then reported as unused-but-ignored rather than problems.
    """
    from zebra_tpu.models.hfload import Mapper, read_checkpoint

    raw = read_checkpoint(path)
    if raw is None:
        return params, {"mapped": 0, "problems": [f"unreadable checkpoint {path}"],
                        "unused": []}
    raw = {(k[4:] if k.startswith("vit.") else k): np.asarray(v) for k, v in raw.items()}
    params = jax.tree.map(np.asarray, params)
    m = Mapper(raw, params)
    put = m.put
    hd = HIDDEN // HEADS

    put(["embeddings", "cls"], "embeddings.cls_token")
    put(["embeddings", "pos"], "embeddings.position_embeddings")
    # HF conv weight is OIHW; flax nn.Conv kernel is HWIO
    put(["embeddings", "patch_embed", "kernel"],
        "embeddings.patch_embeddings.projection.weight",
        lambda v: np.transpose(v, (2, 3, 1, 0)))
    put(["embeddings", "patch_embed", "bias"],
        "embeddings.patch_embeddings.projection.bias")

    ignored = _VIT_IGNORED_PREFIXES
    if mode == "embeddings_mean":
        ignored = ignored + ("encoder.", "layernorm.")
    else:
        for i in range(LAYERS):
            hf = f"encoder.layer.{i}"
            ours = f"block{i}"
            for proj in ("query", "key", "value"):
                put([ours, "attn", proj, "kernel"],
                    f"{hf}.attention.attention.{proj}.weight",
                    lambda v: v.T.reshape(HIDDEN, HEADS, hd))
                put([ours, "attn", proj, "bias"],
                    f"{hf}.attention.attention.{proj}.bias",
                    lambda v: v.reshape(HEADS, hd))
            put([ours, "attn", "out", "kernel"], f"{hf}.attention.output.dense.weight",
                lambda v: v.T.reshape(HEADS, hd, HIDDEN))
            put([ours, "attn", "out", "bias"], f"{hf}.attention.output.dense.bias")
            put([ours, "ln1", "scale"], f"{hf}.layernorm_before.weight")
            put([ours, "ln1", "bias"], f"{hf}.layernorm_before.bias")
            put([ours, "ln2", "scale"], f"{hf}.layernorm_after.weight")
            put([ours, "ln2", "bias"], f"{hf}.layernorm_after.bias")
            put([ours, "fc1", "kernel"], f"{hf}.intermediate.dense.weight", lambda v: v.T)
            put([ours, "fc1", "bias"], f"{hf}.intermediate.dense.bias")
            put([ours, "fc2", "kernel"], f"{hf}.output.dense.weight", lambda v: v.T)
            put([ours, "fc2", "bias"], f"{hf}.output.dense.bias")
        put(["ln_final", "scale"], "layernorm.weight")
        put(["ln_final", "bias"], "layernorm.bias")

    return params, m.report(ignored)


#: tensor-parallel tower cache: (mode, seed, mesh) -> (apply, params).
#: Keyed on the Mesh VALUE (hashable), not id(): an id can be recycled by a
#: new Mesh with a different layout after GC, returning params placed under
#: the wrong sharding (round-3 advisor finding #3); the key also keeps the
#: mesh alive while cached. Bounded — a layout change evicts the oldest.
_TP_CACHE: dict = {}
_TP_CACHE_MAX = 8


def embed_pixels(pixels: np.ndarray, mode: str = "embeddings_mean", seed: int = 0,
                 mesh=None):
    """``[n, 224, 224, 3]`` float32 (ImageNet-normalised) -> ``[n, 768]``.

    ``mesh``: optional ("data", "model") Mesh — runs the tower tensor-
    parallel (SURVEY §2(c), parallel/towers.py); batch must divide the
    data axis. None = single-device jit.
    """
    apply_fn, params = _tower_and_params(mode, seed)
    if mesh is not None:
        key = (mode, seed, mesh)
        if key not in _TP_CACHE:
            from zebra_tpu.parallel.towers import shard_tower

            while len(_TP_CACHE) >= _TP_CACHE_MAX:
                _TP_CACHE.pop(next(iter(_TP_CACHE)))
            _TP_CACHE[key] = shard_tower(apply_fn, params, mesh)
        apply_fn, params = _TP_CACHE[key]
    return np.asarray(apply_fn(params, jnp.asarray(pixels)))
