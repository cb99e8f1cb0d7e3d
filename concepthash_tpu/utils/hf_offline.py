"""Fast-fail guard for HF-hub loads in offline environments.

``transformers.from_pretrained`` retries an unreachable hub 5 times with
exponential backoff (~2.5 minutes per load site) before raising; a run with
a codebook stage and a pretrained backbone pays that twice before hitting
its (by-design) offline fallbacks. The reference assumes network and has no
equivalent (reference models/backbone/clip.py:118 loads unconditionally).

``ensure_hf_reachable`` raises within ~a second when the hub is unreachable
AND the model is not in the local cache, so call sites fall through to their
random-init / deterministic-codebook fallbacks immediately. When the model
IS cached (an HF cache mount — the pretrained-round scenario) or DNS
resolves, it returns silently and ``from_pretrained`` proceeds as usual.
"""

from __future__ import annotations

import socket


def ensure_hf_reachable(model_id: str, filename: str = "config.json") -> None:
    """Raise OSError fast iff the HF hub is unreachable and ``model_id`` is
    absent from the local cache. No-op otherwise."""
    import os

    if os.path.isdir(model_id):
        return  # local-directory checkpoint: no hub involved
    try:
        from huggingface_hub import try_to_load_from_cache

        if isinstance(try_to_load_from_cache(model_id, filename), str):
            return  # locally cached: offline load will succeed
    except Exception:  # pragma: no cover - hub internals changed
        pass
    try:
        # DNS-level probe: NXDOMAIN / no-resolver environments fail in
        # milliseconds (vs from_pretrained's 5-retry backoff). A resolvable
        # but slow hub proceeds to the normal retry path by design.
        socket.getaddrinfo("huggingface.co", 443)
        # resolve-but-blocked egress is the other offline shape: a short
        # direct-connect probe catches it. When a proxy is configured the
        # direct connect legitimately fails while from_pretrained succeeds
        # through the proxy — skip the probe and let the hub client decide.
        if not any(os.environ.get(k) for k in
                   ("HTTPS_PROXY", "https_proxy", "HTTP_PROXY",
                    "http_proxy", "ALL_PROXY", "all_proxy")):
            socket.create_connection(("huggingface.co", 443),
                                     timeout=2.0).close()
    except OSError as e:
        raise OSError(
            f"HF hub unreachable and {model_id!r} not in the local cache "
            f"({e}); mount an HF cache (HF_HOME) or restore network") from e
