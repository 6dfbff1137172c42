"""Default database configurations.

Reference type aliases with their dim/metric/model pairings
(``src/database/default/{text,image,audio}.rs``):

  text : 384-d, L2-squared, BGE-small-en-v1.5      (default/text.rs:8-14)
  image: 768-d, cosine,    ViT-base-patch16-224    (default/image.rs:8-15)
  audio: 768-d, cosine,    audio ViT (spectrogram) (default/audio.rs:8-15)
"""

from __future__ import annotations

from zebra_tpu.config import DatabaseConfig, IndexOptions
from zebra_tpu.db import Database
from zebra_tpu.models.base import DIM_BGESMALL_EN_1_5, DIM_VIT_BASE_PATCH16_224


def text_config(options: IndexOptions | None = None, shards: int = 1) -> DatabaseConfig:
    return DatabaseConfig(
        dim=DIM_BGESMALL_EN_1_5,
        metric="sql2",
        model="bge-small-en-v1.5",
        index=options or IndexOptions(),
        shards=shards,
    )


def image_config(options: IndexOptions | None = None, shards: int = 1) -> DatabaseConfig:
    return DatabaseConfig(
        dim=DIM_VIT_BASE_PATCH16_224,
        metric="cosine",
        model="vit-base-patch16-224",
        index=options or IndexOptions(),
        shards=shards,
    )


def audio_config(options: IndexOptions | None = None, shards: int = 1) -> DatabaseConfig:
    return DatabaseConfig(
        dim=DIM_VIT_BASE_PATCH16_224,
        metric="cosine",
        model="vit-audio",
        index=options or IndexOptions(),
        shards=shards,
    )


def text_db(path: str, options: IndexOptions | None = None, shards: int = 1) -> Database:
    return Database.open_or_create(path, text_config(options, shards))


def image_db(path: str, options: IndexOptions | None = None, shards: int = 1) -> Database:
    return Database.open_or_create(path, image_config(options, shards))


def audio_db(path: str, options: IndexOptions | None = None, shards: int = 1) -> Database:
    return Database.open_or_create(path, audio_config(options, shards))


class DefaultTextDatabase:
    """Alias matching the reference's ``DefaultTextDatabase``."""

    @staticmethod
    def open_or_create(path: str, options: IndexOptions | None = None) -> Database:
        return text_db(path, options)


class DefaultImageDatabase:
    @staticmethod
    def open_or_create(path: str, options: IndexOptions | None = None) -> Database:
        return image_db(path, options)


class DefaultAudioDatabase:
    @staticmethod
    def open_or_create(path: str, options: IndexOptions | None = None) -> Database:
        return audio_db(path, options)
