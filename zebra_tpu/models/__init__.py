"""Embedding models: protocol, registry, and the text / image / audio towers."""

from zebra_tpu.models.base import EmbeddingModel, HashEmbeddingModel, get_model, register_model

__all__ = ["EmbeddingModel", "HashEmbeddingModel", "get_model", "register_model"]
