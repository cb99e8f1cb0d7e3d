"""Fused LayerNorm->matmul kernel (ops/fused_ln.py): forward parity with the
XLA composition (interpret mode on CPU), gradient parity through the custom
VJP, padded-tail masking."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from concepthash_tpu.ops.fused_ln import ln_matmul


def _ref(x, gamma, beta, w, bias, eps=1e-5):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    xn = (xf - mu) * jax.lax.rsqrt(var + eps) * gamma + beta
    return xn.astype(x.dtype) @ w + bias


@pytest.mark.parametrize("N,D,F", [(16, 32, 64), (70, 32, 48)])  # 70: padded tail
def test_forward_parity(rng, N, D, F):
    x = jnp.asarray(rng.standard_normal((N, D)), jnp.float32)
    gamma = jnp.asarray(rng.standard_normal(D), jnp.float32)
    beta = jnp.asarray(rng.standard_normal(D), jnp.float32)
    w = jnp.asarray(rng.standard_normal((D, F)) * 0.1, jnp.float32)
    bias = jnp.asarray(rng.standard_normal(F), jnp.float32)
    out = ln_matmul(x, gamma, beta, w, bias, impl="pallas", interpret=True)
    ref = _ref(x, gamma, beta, w, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_forward_parity_3d(rng):
    x = jnp.asarray(rng.standard_normal((2, 7, 32)), jnp.float32)
    gamma = jnp.ones(32)
    beta = jnp.zeros(32)
    w = jnp.asarray(rng.standard_normal((32, 16)) * 0.1, jnp.float32)
    bias = jnp.zeros(16)
    out = ln_matmul(x, gamma, beta, w, bias, impl="pallas", interpret=True)
    assert out.shape == (2, 7, 16)
    ref = _ref(x.reshape(-1, 32), gamma, beta, w, bias).reshape(2, 7, 16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_gradient_parity(rng):
    D, F = 32, 24
    x = jnp.asarray(rng.standard_normal((10, D)), jnp.float32)
    gamma = jnp.asarray(1 + 0.1 * rng.standard_normal(D), jnp.float32)
    beta = jnp.asarray(0.1 * rng.standard_normal(D), jnp.float32)
    w = jnp.asarray(rng.standard_normal((D, F)) * 0.2, jnp.float32)
    bias = jnp.asarray(rng.standard_normal(F), jnp.float32)
    tgt = jnp.asarray(rng.standard_normal((10, F)), jnp.float32)

    def loss(impl):
        def f(x, gamma, beta, w, bias):
            y = ln_matmul(x, gamma, beta, w, bias, impl=impl, interpret=True)
            return ((y - tgt) ** 2).sum()
        return f

    g_p = jax.grad(loss("pallas"), argnums=(0, 1, 2, 3, 4))(
        x, gamma, beta, w, bias)
    g_x = jax.grad(loss("xla"), argnums=(0, 1, 2, 3, 4))(
        x, gamma, beta, w, bias)
    for a, b in zip(g_p, g_x):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_tower_fused_matches_unfused(rng):
    """End-to-end ViT tower: fused_ln='pallas' (interpret mode on CPU) must
    reproduce the unfused path bit-for-tolerance with the SAME params — the
    param-mirror modules guarantee an identical tree."""
    from concepthash_tpu.models.clip import ClipVisionConfig, ClipVisionTower

    cfg_x = ClipVisionConfig(hidden_size=32, intermediate_size=64,
                             num_layers=2, num_heads=4, image_size=16,
                             patch_size=8, projection_dim=32, fused_ln="xla")
    cfg_p = ClipVisionConfig(**{**cfg_x.__dict__, "fused_ln": "pallas"})
    img = jnp.asarray(rng.standard_normal((2, 16, 16, 3)), jnp.float32)
    tower_x, tower_p = ClipVisionTower(cfg_x), ClipVisionTower(cfg_p)
    params_x = tower_x.init(jax.random.PRNGKey(0), img)["params"]
    params_p = tower_p.init(jax.random.PRNGKey(0), img)["params"]
    # identical param trees (names, shapes) -> checkpoints interchangeable
    assert (jax.tree_util.tree_structure(params_x)
            == jax.tree_util.tree_structure(params_p))
    for a, b in zip(jax.tree_util.tree_leaves(params_x),
                    jax.tree_util.tree_leaves(params_p)):
        assert a.shape == b.shape
    out_x = tower_x.apply({"params": params_x}, img)
    out_p = tower_p.apply({"params": params_x}, img)
    np.testing.assert_allclose(np.asarray(out_p["pooled"]),
                               np.asarray(out_x["pooled"]),
                               rtol=1e-4, atol=1e-4)


def test_xla_fallback_matches(rng):
    x = jnp.asarray(rng.standard_normal((6, 16)), jnp.float32)
    out = ln_matmul(x, jnp.ones(16), jnp.zeros(16),
                    jnp.eye(16), jnp.zeros(16), impl="auto")
    # identity weight: output is just LN(x)
    ref = _ref(x, jnp.ones(16), jnp.zeros(16), jnp.eye(16), jnp.zeros(16))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5,
                               atol=1e-6)
