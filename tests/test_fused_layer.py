"""Fused whole-encoder-layer kernel (ops/fused_layer.py): forward parity
with the XLA composition (interpret mode on CPU), gradient parity through
the custom VJP, tower-level param-tree interchangeability, padded L/B."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from concepthash_tpu.ops.fused_layer import (LayerWeights, _xla_layer,
                                             encoder_layer)


def _weights(rng, D, F):
    r = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.1, jnp.float32)
    return LayerWeights(
        ln1_scale=jnp.asarray(1 + 0.1 * rng.standard_normal(D), jnp.float32),
        ln1_bias=r(D), w_qkv=r(D, 3 * D), b_qkv=r(3 * D),
        w_out=r(D, D), b_out=r(D),
        ln2_scale=jnp.asarray(1 - 0.1 * rng.standard_normal(D), jnp.float32),
        ln2_bias=r(D), w_fc1=r(D, F), b_fc1=r(F), w_fc2=r(F, D), b_fc2=r(D))


@pytest.mark.parametrize("B,L,D,H,F", [
    (2, 8, 32, 4, 64),     # aligned
    (3, 7, 32, 4, 96),     # padded L (7->8) and B (3->pad), n_fc=1
    (2, 8, 32, 4, 128),    # F chunked (Fc=64 after halving? no: F%Fc)
])
def test_forward_parity(rng, B, L, D, H, F):
    w = _weights(rng, D, F)
    x = jnp.asarray(rng.standard_normal((B, L, D)), jnp.float32)
    out = encoder_layer(x, w, num_heads=H, impl="pallas_layer",
                        interpret=True)
    ref = _xla_layer(x, w, num_heads=H, eps=1e-5, act="quick_gelu")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_forward_parity_chunked_mlp(rng):
    """F not an aligned multiple of the preferred chunk: exercises the
    grid's minor (fc) axis with n_fc > 1 and the single-bias-add rule."""
    B, L, D, H, F = 2, 8, 32, 4, 256
    w = _weights(rng, D, F)
    x = jnp.asarray(rng.standard_normal((B, L, D)), jnp.float32)
    out = encoder_layer(x, w, num_heads=H, impl="pallas_layer",
                        interpret=True)
    ref = _xla_layer(x, w, num_heads=H, eps=1e-5, act="quick_gelu")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_gradient_parity(rng):
    B, L, D, H, F = 2, 8, 32, 4, 64
    w = _weights(rng, D, F)
    x = jnp.asarray(rng.standard_normal((B, L, D)), jnp.float32)
    tgt = jnp.asarray(rng.standard_normal((B, L, D)), jnp.float32)

    def loss(impl):
        def f(x, w):
            y = encoder_layer(x, w, num_heads=H, impl=impl, interpret=True)
            return ((y - tgt) ** 2).sum()
        return f

    gx_p, gw_p = jax.grad(loss("pallas_layer"), argnums=(0, 1))(x, w)
    gx_x, gw_x = jax.grad(loss("xla"), argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_x),
                               rtol=1e-3, atol=1e-3)
    for a, b in zip(gw_p, gw_x):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-3)


def test_tower_fused_layer_matches_discrete(rng):
    """ViT tower with fused_ln='pallas_layer' (whole-layer kernel, interpret
    mode on CPU) reproduces the discrete path with the SAME params — the
    _AttnParamsMirror tree is checkpoint-identical."""
    from concepthash_tpu.models.clip import ClipVisionConfig, ClipVisionTower

    cfg_x = ClipVisionConfig(hidden_size=32, intermediate_size=64,
                             num_layers=2, num_heads=4, image_size=16,
                             patch_size=8, projection_dim=32, fused_ln="xla")
    cfg_p = ClipVisionConfig(**{**cfg_x.__dict__, "fused_ln": "pallas_layer"})
    img = jnp.asarray(rng.standard_normal((2, 16, 16, 3)), jnp.float32)
    tower_x, tower_p = ClipVisionTower(cfg_x), ClipVisionTower(cfg_p)
    params_x = tower_x.init(jax.random.PRNGKey(0), img)["params"]
    params_p = tower_p.init(jax.random.PRNGKey(0), img)["params"]
    assert (jax.tree_util.tree_structure(params_x)
            == jax.tree_util.tree_structure(params_p))
    for a, b in zip(jax.tree_util.tree_leaves(params_x),
                    jax.tree_util.tree_leaves(params_p)):
        assert a.shape == b.shape
    out_x = tower_x.apply({"params": params_x}, img)
    out_p = tower_p.apply({"params": params_x}, img)
    np.testing.assert_allclose(np.asarray(out_p["pooled"]),
                               np.asarray(out_x["pooled"]),
                               rtol=2e-4, atol=2e-4)


def _adapter_weights(rng, D, A):
    from concepthash_tpu.ops.fused_layer import AdapterWeights

    r = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.1, jnp.float32)
    return AdapterWeights(
        ln_scale=jnp.asarray(1 + 0.1 * rng.standard_normal(D), jnp.float32),
        ln_bias=r(D), w_down=r(D, A), b_down=r(A), w_up=r(A, D), b_up=r(D),
        scale=jnp.asarray([0.7], jnp.float32))


def test_forward_parity_with_adapters(rng):
    """Parallel branch adapters (after-attention + after-MLP) inside the
    kernel match the XLA composition (erf approximation < bf16 ulp)."""
    B, L, D, H, F, A = 2, 8, 32, 4, 128, 16
    w = _weights(rng, D, F)
    a1, a2 = _adapter_weights(rng, D, A), _adapter_weights(rng, D, A)
    x = jnp.asarray(rng.standard_normal((B, L, D)), jnp.float32)
    out = encoder_layer(x, w, num_heads=H, adapter_attn=a1, adapter_mlp=a2,
                        impl="pallas_layer", interpret=True)
    ref = _xla_layer(x, w, a1, a2, num_heads=H, eps=1e-5, act="quick_gelu")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_gradient_parity_with_adapters(rng):
    B, L, D, H, F, A = 2, 8, 32, 4, 64, 16
    w = _weights(rng, D, F)
    a1, a2 = _adapter_weights(rng, D, A), _adapter_weights(rng, D, A)
    x = jnp.asarray(rng.standard_normal((B, L, D)), jnp.float32)
    tgt = jnp.asarray(rng.standard_normal((B, L, D)), jnp.float32)

    def loss(impl):
        def f(x, w, a1, a2):
            y = encoder_layer(x, w, num_heads=H, adapter_attn=a1,
                              adapter_mlp=a2, impl=impl, interpret=True)
            return ((y - tgt) ** 2).sum()
        return f

    g_p = jax.grad(loss("pallas_layer"), argnums=(0, 1, 2, 3))(x, w, a1, a2)
    g_x = jax.grad(loss("xla"), argnums=(0, 1, 2, 3))(x, w, a1, a2)
    for a, b in zip(jax.tree_util.tree_leaves(g_p),
                    jax.tree_util.tree_leaves(g_x)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-3)


def test_tower_adapters_fused_matches_discrete(rng):
    """Tower with adapters: fused_ln='pallas_layer' runs the adapters inside
    the kernel and must reproduce the discrete path with the SAME params
    (adapter mirrors are checkpoint-identical; up-kernels randomized so the
    adapters actually contribute)."""
    from concepthash_tpu.models.clip import (AdapterConfig, ClipVisionConfig,
                                             ClipVisionTower)

    cfg_x = ClipVisionConfig(hidden_size=32, intermediate_size=64,
                             num_layers=2, num_heads=4, image_size=16,
                             patch_size=8, projection_dim=32, fused_ln="xla")
    cfg_p = ClipVisionConfig(**{**cfg_x.__dict__, "fused_ln": "pallas_layer"})
    ad = AdapterConfig(bottleneck_dim=8)
    img = jnp.asarray(rng.standard_normal((2, 16, 16, 3)), jnp.float32)
    tower_x = ClipVisionTower(cfg_x, adapters=ad)
    tower_p = ClipVisionTower(cfg_p, adapters=ad)
    params_x = tower_x.init(jax.random.PRNGKey(0), img)["params"]
    params_p = tower_p.init(jax.random.PRNGKey(0), img)["params"]
    assert (jax.tree_util.tree_structure(params_x)
            == jax.tree_util.tree_structure(params_p))
    # randomize the zero-init adapter up-projections so they contribute
    params = jax.tree_util.tree_map_with_path(
        lambda p, v: (jnp.asarray(
            rng.standard_normal(v.shape) * 0.1, v.dtype)
            if "adapter" in jax.tree_util.keystr(p) and "up" in
            jax.tree_util.keystr(p) and v.ndim == 2 else v),
        params_x)
    out_x = tower_x.apply({"params": params}, img)
    out_p = tower_p.apply({"params": params}, img)
    np.testing.assert_allclose(np.asarray(out_p["pooled"]),
                               np.asarray(out_x["pooled"]),
                               rtol=3e-4, atol=3e-4)


def test_qkvo_adapters_fall_back_to_discrete(rng):
    """q/k/v/out projection adapters are outside the kernel's scope:
    'pallas_layer' must run the discrete path there."""
    from concepthash_tpu.models.clip import (AdapterConfig, ClipVisionConfig,
                                             ClipVisionTower)

    cfg = ClipVisionConfig(hidden_size=32, intermediate_size=64,
                           num_layers=1, num_heads=4, image_size=16,
                           patch_size=8, projection_dim=32,
                           fused_ln="pallas_layer")
    img = jnp.asarray(rng.standard_normal((1, 16, 16, 3)), jnp.float32)
    tower = ClipVisionTower(cfg, adapters=AdapterConfig(
        bottleneck_dim=8, attention_qkvo=True))
    params = tower.init(jax.random.PRNGKey(0), img)["params"]
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    assert any("adapter_q_proj" in jax.tree_util.keystr(p) for p, _ in flat)
    out = tower.apply({"params": params}, img)
    assert np.isfinite(np.asarray(out["pooled"])).all()
