"""SEMICON proper (reference models/arch/semicon.py:548-641): global+local
sub-codes with iterative suppression-attention — the erasure must actually
suppress previously-attended tokens before the next branch looks."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from concepthash_tpu.models.clip import AdapterConfig, ClipVisionConfig
from concepthash_tpu.models.finegrained import FineGrainedConfig, Semicon

VCFG = ClipVisionConfig(hidden_size=32, intermediate_size=64, num_layers=2,
                        num_heads=4, image_size=16, patch_size=4,
                        projection_dim=32)
CFG = FineGrainedConfig(nbit=16, nclass=4, num_attns=4)


@pytest.fixture(scope="module")
def model_and_vars(rng_np=np.random.default_rng(0)):
    model = Semicon(VCFG, CFG, adapters=AdapterConfig(bottleneck_dim=8))
    imgs = jnp.asarray(rng_np.standard_normal((4, 16, 16, 3)), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)},
                           imgs, train=False)
    return model, variables, imgs


def test_codes_shape_and_structure(model_and_vars):
    model, variables, imgs = model_and_vars
    out = model.apply(variables, imgs, train=False)
    assert out["codes"].shape == (4, 16)
    assert np.abs(np.asarray(out["codes"])).max() <= 1.0  # tanh sub-codes
    # global branch owns nbit/2, each of the 4 locals nbit/8 (ref :612-629)
    assert 16 - (16 // (2 * 4)) * 4 == 8


def test_attention_erasing_suppresses_attended_tokens(model_and_vars):
    model, variables, imgs = model_and_vars
    out = model.apply(variables, imgs, train=False, output_attentions=True)
    maps = np.asarray(out["attn_maps"])          # (B, A, P)
    suppress = np.asarray(out["suppress"])       # (B, A-1, P)
    assert maps.shape == (4, 4, 16) and suppress.shape == (4, 3, 16)
    # suppression factor lives in [0, 2] (reference _mask clamp, :583-592)
    assert suppress.min() >= 0.0 and suppress.max() <= 2.0
    # the token each branch attends most is suppressed (< 1) for the next
    for b in range(maps.shape[0]):
        for i in range(suppress.shape[1]):
            top = maps[b, i].argmax()
            assert suppress[b, i, top] < 1.0, (b, i, suppress[b, i, top])


def test_gradients_reach_attention_convs(model_and_vars):
    model, variables, imgs = model_and_vars

    def loss(params):
        out = model.apply({"params": params}, imgs, train=False)
        return (out["codes"] ** 2).sum()

    grads = jax.grad(loss)(variables["params"])
    g = np.asarray(grads["sem_attn_0"]["kernel"])
    assert np.abs(g).max() > 0.0  # gating path is differentiable


def test_semicon_method_registry_builds_semicon():
    from concepthash_tpu.methods import get_method

    m = get_method("semicon")
    assert m.regime == "adsh"
    cfg = {"model": {"name": "semicon", "nbit": 16, "nclass": 4,
                     "num_attns": 4, "has_adapter": True,
                     "adapter_bottleneck_dim": 8},
           "backbone": {"name": "tiny", "hidden_size": 32,
                        "intermediate_size": 64, "num_layers": 2,
                        "num_heads": 4, "patch_size": 4, "image_size": 16,
                        "projection_dim": 32}}
    model = m.build_model(cfg, None)
    assert isinstance(model, Semicon)
    imgs = jnp.zeros((2, 16, 16, 3))
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           imgs, train=False)
    out = model.apply(variables, imgs, train=False)
    assert out["codes"].shape == (2, 16)
