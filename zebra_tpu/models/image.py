"""Image embedding: decode -> resize-to-fill 224² -> normalise -> ViT tower.

Preprocessing parity with the reference's ``load_image224``
(``src/model/image.rs:24-43``): decode any common format, scale so the short
side fills 224 (cover), centre-crop to 224x224, RGB, ImageNet mean/std
normalisation. The reference emits CHW; our tower takes NHWC (TPU conv
layout) — same pixels.
"""

from __future__ import annotations

import io

import numpy as np

from zebra_tpu.models.base import BaseModel, DIM_VIT_BASE_PATCH16_224
from zebra_tpu.models.vit import IMAGE_SIZE, embed_pixels

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)


def load_image224(data: bytes) -> np.ndarray:
    """Decode bytes -> ``[224, 224, 3]`` float32, ImageNet-normalised."""
    from PIL import Image

    img = Image.open(io.BytesIO(data)).convert("RGB")
    w, h = img.size
    scale = IMAGE_SIZE / min(w, h)  # fill: short side -> 224, crop the rest
    nw, nh = max(IMAGE_SIZE, round(w * scale)), max(IMAGE_SIZE, round(h * scale))
    img = img.resize((nw, nh), Image.BILINEAR)
    left = (nw - IMAGE_SIZE) // 2
    top = (nh - IMAGE_SIZE) // 2
    img = img.crop((left, top, left + IMAGE_SIZE, top + IMAGE_SIZE))
    arr = np.asarray(img, dtype=np.float32) / 255.0
    return (arr - IMAGENET_MEAN) / IMAGENET_STD


class VitImageModel(BaseModel):
    """768-d image embeddings via the ViT tower (reference
    ``VitBasePatch16_224``, ``src/model/image.rs:50-83`` — with the
    zero-vector flatten bug fixed to a real pooled embedding)."""

    dim = DIM_VIT_BASE_PATCH16_224
    name = "vit-base-patch16-224"

    def __init__(self, mode: str = "embeddings_mean", batch_size: int = 32,
                 mesh=None):
        self.mode = mode
        self.batch_size = batch_size
        #: optional ("data", "model") Mesh for a tensor-parallel tower
        self.mesh = mesh

    def embed_documents(self, documents: list[bytes]) -> np.ndarray:
        out = np.empty((len(documents), self.dim), dtype=np.float32)
        for start in range(0, len(documents), self.batch_size):
            batch = documents[start : start + self.batch_size]
            # pad to a fixed batch so the jitted tower compiles once
            pixels = np.zeros((self.batch_size, IMAGE_SIZE, IMAGE_SIZE, 3), np.float32)
            for i, d in enumerate(batch):
                pixels[i] = load_image224(d)
            out[start : start + len(batch)] = embed_pixels(
                pixels, mode=self.mode, mesh=self.mesh
            )[: len(batch)]
        return out

    def status(self) -> dict:
        from zebra_tpu.models.vit import weight_status

        degr = weight_status(self.mode)
        return {"semantic": not degr, "degradations": degr}
