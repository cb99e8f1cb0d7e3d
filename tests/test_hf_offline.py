"""Fast-fail offline guard (utils/hf_offline.py): HF loads must not pay
transformers' 5-retry backoff (~2.5 min/site) before hitting their offline
fallbacks. Reference has no equivalent (models/backbone/clip.py:118 assumes
network)."""

import socket
import time

import pytest

from concepthash_tpu.utils.hf_offline import ensure_hf_reachable


def test_raises_fast_when_unreachable_and_uncached(monkeypatch):
    def no_dns(*a, **k):
        raise socket.gaierror(-2, "Name or service not known")

    monkeypatch.setattr(socket, "getaddrinfo", no_dns)
    t0 = time.perf_counter()
    with pytest.raises(OSError, match="unreachable"):
        ensure_hf_reachable("openai/clip-vit-base-patch32")
    assert time.perf_counter() - t0 < 5.0


def test_noop_when_cached(monkeypatch, tmp_path):
    import concepthash_tpu.utils.hf_offline as mod

    # simulate a cache hit: try_to_load_from_cache returns a str path
    import huggingface_hub

    monkeypatch.setattr(huggingface_hub, "try_to_load_from_cache",
                        lambda *a, **k: str(tmp_path / "config.json"))

    def no_dns(*a, **k):  # even with dead DNS, a cache hit must pass
        raise socket.gaierror(-2, "nope")

    monkeypatch.setattr(socket, "getaddrinfo", no_dns)
    ensure_hf_reachable("openai/clip-vit-base-patch32")  # no raise


def test_noop_when_dns_resolves(monkeypatch):
    monkeypatch.setattr(socket, "getaddrinfo", lambda *a, **k: [])
    ensure_hf_reachable("some/model")  # no raise
