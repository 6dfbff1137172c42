"""Host-side durable storage: document blobs, manifests, snapshots."""

from zebra_tpu.storage.blobs import DocumentStore

__all__ = ["DocumentStore"]
