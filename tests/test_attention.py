"""Pallas fused attention: forward parity with the XLA einsum path (interpret
mode on CPU), gradient parity through the custom VJP, padded-length masking."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from concepthash_tpu.ops.attention import attention, fused_attention


def xla_attention(q, k, v):
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k)
    p = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v)


@pytest.mark.parametrize("L", [16, 54])  # 54 = CLIP-B/32 + 4 concept tokens
def test_forward_parity(rng, L):
    B, H, hd = 2, 4, 16
    q = jnp.asarray(rng.standard_normal((B, L, H, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, L, H, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, L, H, hd)), jnp.float32)
    ref = xla_attention(q, k, v)
    out = fused_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_gradient_parity(rng):
    B, L, H, hd = 2, 10, 2, 8
    q = jnp.asarray(rng.standard_normal((B, L, H, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, L, H, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, L, H, hd)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((B, L, H, hd)), jnp.float32)

    def loss_fused(q, k, v):
        return (fused_attention(q, k, v, interpret=True) * w).sum()

    def loss_ref(q, k, v):
        return (xla_attention(q, k, v) * w).sum()

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_dispatcher_cpu_falls_back(rng):
    q = jnp.asarray(rng.standard_normal((1, 6, 2, 8)), jnp.float32)
    out = attention(q, q, q, impl="auto")  # CPU -> xla path
    ref = xla_attention(q, q, q)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5,
                               atol=1e-5)


def test_tower_with_pallas_impl_matches_xla(rng):
    """End-to-end through the ViT tower: attention_impl must not change the
    function (interpret-mode pallas vs einsum)."""
    from concepthash_tpu.models.clip import ClipVisionConfig, ClipVisionTower
    from concepthash_tpu.ops import attention as A

    cfg_x = ClipVisionConfig(hidden_size=32, intermediate_size=64, num_layers=2,
                             num_heads=4, image_size=16, patch_size=8,
                             projection_dim=32, attention_impl="xla")
    cfg_p = ClipVisionConfig(**{**cfg_x.__dict__, "attention_impl": "pallas"})
    img = jnp.asarray(rng.standard_normal((2, 16, 16, 3)), jnp.float32)
    tower_x = ClipVisionTower(cfg_x)
    params = tower_x.init(jax.random.PRNGKey(0), img)["params"]
    out_x = tower_x.apply({"params": params}, img)

    orig = A._pallas_forward
    A_calls = []

    def interpreted(q, k, v, interpret):
        A_calls.append(1)
        return orig(q, k, v, True)  # force interpret on CPU

    A._pallas_forward = interpreted
    try:
        out_p = ClipVisionTower(cfg_p).apply({"params": params}, img)
    finally:
        A._pallas_forward = orig
    assert A_calls, "pallas path was not exercised"
    np.testing.assert_allclose(np.asarray(out_p["pooled"]),
                               np.asarray(out_x["pooled"]), rtol=1e-4, atol=1e-4)
