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

    # pin the uncached branch: a host with a real HF cache mount would
    # otherwise return before the DNS probe and never raise
    import huggingface_hub

    monkeypatch.setattr(huggingface_hub, "try_to_load_from_cache",
                        lambda *a, **k: None)
    monkeypatch.setattr(socket, "getaddrinfo", no_dns)
    t0 = time.perf_counter()
    with pytest.raises(OSError, match="unreachable"):
        ensure_hf_reachable("openai/clip-vit-base-patch32")
    assert time.perf_counter() - t0 < 5.0


def test_noop_for_local_directory(monkeypatch, tmp_path):
    """A local-directory checkpoint (e.g. parity/assets/tiny-clip) involves
    no hub: the guard must pass it through even with dead DNS. Regression:
    the guard once treated dir paths as hub ids and forced the parity runs
    onto random-init backbones."""
    def no_dns(*a, **k):
        raise socket.gaierror(-2, "Name or service not known")

    monkeypatch.setattr(socket, "getaddrinfo", no_dns)
    ensure_hf_reachable(str(tmp_path))  # no raise


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


def test_noop_when_dns_resolves_and_connects(monkeypatch):
    class _Sock:
        def close(self):
            pass

    monkeypatch.setattr(socket, "getaddrinfo", lambda *a, **k: [])
    monkeypatch.setattr(socket, "create_connection", lambda *a, **k: _Sock())
    ensure_hf_reachable("some/model")  # no raise


def test_raises_when_resolvable_but_blocked(monkeypatch):
    """Resolver works but egress is blocked (firewall/sandbox): must still
    fast-fail instead of paying the retry backoff."""
    import huggingface_hub

    monkeypatch.setattr(huggingface_hub, "try_to_load_from_cache",
                        lambda *a, **k: None)
    monkeypatch.setattr(socket, "getaddrinfo", lambda *a, **k: [])

    def refused(*a, **k):
        raise socket.timeout("connect timed out")

    monkeypatch.setattr(socket, "create_connection", refused)
    monkeypatch.delenv("HTTPS_PROXY", raising=False)
    monkeypatch.delenv("https_proxy", raising=False)
    with pytest.raises(OSError, match="unreachable"):
        ensure_hf_reachable("some/model")


def test_proxy_env_skips_connect_probe(monkeypatch):
    """With a proxy configured, a failing DIRECT connect must not block the
    hub client (which connects through the proxy)."""
    monkeypatch.setattr(socket, "getaddrinfo", lambda *a, **k: [])

    def boom(*a, **k):
        raise AssertionError("direct connect must not be probed")

    monkeypatch.setattr(socket, "create_connection", boom)
    monkeypatch.setenv("HTTPS_PROXY", "http://proxy:3128")
    ensure_hf_reachable("some/model")  # no raise
