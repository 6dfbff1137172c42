"""Weight-fetch plumbing (round-3 verdict do #8).

Network is unavailable here (zero-egress box), so these tests cover the
cache layout, the loader fallback resolution, and the honest-error
contract — the actual download path is exercised on connected machines by
the CI optional-deps job.
"""

import os

import pytest

from zebra_tpu.models import fetch


def test_cache_dir_override(tmp_path, monkeypatch):
    monkeypatch.setenv("ZEBRA_TPU_WEIGHTS_CACHE", str(tmp_path))
    assert fetch.cache_dir("bge-small") == str(tmp_path / "bge-small")
    assert fetch.cached_weights("bge-small") is None
    d = tmp_path / "bge-small"
    d.mkdir()
    (d / "model.safetensors").write_bytes(b"x")
    assert fetch.cached_weights("bge-small") == str(d / "model.safetensors")


def test_fetch_unknown_model():
    with pytest.raises(ValueError, match="unknown model"):
        fetch.fetch("nope")


def test_fetch_honest_error_offline(tmp_path, monkeypatch):
    """No network: the error must name the repo/file and the env-var
    workaround, not crash opaquely."""
    monkeypatch.setenv("ZEBRA_TPU_WEIGHTS_CACHE", str(tmp_path))
    monkeypatch.setenv("HF_HUB_OFFLINE", "1")
    try:
        import huggingface_hub  # noqa: F401
    except ImportError:
        with pytest.raises(RuntimeError, match="huggingface_hub"):
            fetch.fetch("vit")
        return
    with pytest.raises(RuntimeError, match="ZEBRA_TPU_VIT_WEIGHTS"):
        fetch.fetch("vit")


def test_loaders_resolve_cache(tmp_path, monkeypatch):
    """With env vars unset, the text/vit loaders consult the fetch cache."""
    monkeypatch.setenv("ZEBRA_TPU_WEIGHTS_CACHE", str(tmp_path))
    monkeypatch.delenv("ZEBRA_TPU_BGE_WEIGHTS", raising=False)
    monkeypatch.delenv("ZEBRA_TPU_VIT_WEIGHTS", raising=False)
    from zebra_tpu.models.text import _resolve_weights_path as bge_path
    from zebra_tpu.models.vit import _resolve_weights_path as vit_path

    assert bge_path() == ""
    assert vit_path() == ""
    for m in ("bge-small", "vit"):
        d = tmp_path / m
        d.mkdir()
        (d / "model.safetensors").write_bytes(b"x")
    assert bge_path() == str(tmp_path / "bge-small" / "model.safetensors")
    assert vit_path() == str(tmp_path / "vit" / "model.safetensors")
    # env var still wins over the cache
    monkeypatch.setenv("ZEBRA_TPU_BGE_WEIGHTS", "/some/explicit.safetensors")
    assert bge_path() == "/some/explicit.safetensors"
