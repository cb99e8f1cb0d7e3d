"""NSH — Naturally-Sorted Hashing (reference trainers/nsh.py contract; loss
reconstructed from Yu et al., IJCAI 2022 — see losses/unsupervised.nsh_loss)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from concepthash_tpu.losses.unsupervised import nsh_loss
from concepthash_tpu.methods import get_method

BACKBONE = {"name": "tiny", "hidden_size": 32, "intermediate_size": 64,
            "num_layers": 2, "num_heads": 4, "patch_size": 8,
            "image_size": 16, "projection_dim": 32}


def _outputs(codes, latents):
    return {"codes": jnp.asarray(codes, jnp.float32),
            "latents": jnp.asarray(latents, jnp.float32)}


def test_sort_loss_rewards_matched_views():
    """When each image's two views share a code and codes are mutually
    distant, the positive ranks first -> lower sort loss than shuffled
    codes."""
    rng = np.random.default_rng(0)
    base = np.sign(rng.standard_normal((6, 16))).astype(np.float32) * 3
    good = np.concatenate([base + 0.1 * rng.standard_normal((6, 16)),
                           base + 0.1 * rng.standard_normal((6, 16))])
    z = rng.standard_normal((12, 8)).astype(np.float32)
    loss_good, parts_good = nsh_loss(_outputs(good, z), None)
    # break the correspondence: roll the second view's codes by one image
    bad = good.copy()
    bad[6:] = np.roll(bad[6:], 1, axis=0)
    loss_bad, parts_bad = nsh_loss(_outputs(bad, z), None)
    assert float(parts_good["sort"]) < float(parts_bad["sort"])


def test_loss_parts_finite_and_weighted():
    rng = np.random.default_rng(1)
    out = _outputs(rng.standard_normal((8, 16)), rng.standard_normal((8, 8)))
    total, parts = nsh_loss(out, None, lambda_q=0.5, lambda_c=2.0)
    assert set(parts) == {"sort", "contrastive", "quan"}
    expected = parts["sort"] + 2.0 * parts["contrastive"] + 0.5 * parts["quan"]
    assert float(total) == pytest.approx(float(expected), rel=1e-6)


def test_nsh_method_trains_and_loss_decreases():
    from concepthash_tpu.train.optim import build_optimizer
    from concepthash_tpu.train.state import create_train_state, make_train_step

    m = get_method("nsh")
    assert m.two_view and m.unsupervised
    cfg = {"model": {"name": "nsh", "nbit": 16, "nclass": 4,
                     "latent_dim": 16, "has_adapter": True,
                     "adapter_bottleneck_dim": 8},
           "backbone": BACKBONE, "criterion": {"name": "nsh"}}
    model = m.build_model(cfg, None)
    loss_fn = m.build_loss(cfg, None)

    rng = jax.random.PRNGKey(0)
    # two-view training batch: 2 x 4 images
    imgs = jnp.asarray(np.random.default_rng(2).standard_normal((8, 16, 16, 3)),
                       jnp.float32)
    params = model.init({"params": rng, "dropout": jax.random.fold_in(rng, 1)},
                        imgs, train=True)["params"]
    tx = build_optimizer({"name": "adam", "lr": 1e-3}, {"name": "no_decay"},
                         10, 1, params)
    state = create_train_state(model, tx, imgs, rng)
    step = make_train_step(model, loss_fn, tx, donate=False)

    protos = np.random.default_rng(3).standard_normal((4, 16, 16, 3))
    losses = []
    for i in range(8):
        r = np.random.default_rng(10 + i)
        v1 = protos + 0.05 * r.standard_normal(protos.shape)
        v2 = protos + 0.05 * r.standard_normal(protos.shape)
        batch = {"image": jnp.asarray(np.concatenate([v1, v2]), jnp.float32),
                 "label": jnp.zeros((8, 4), jnp.float32)}
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert np.mean(losses[-2:]) < np.mean(losses[:2]), losses
    # eval-mode forward emits retrieval codes
    out = model.apply({"params": jax.device_get(state.params)},
                      imgs, train=False)
    assert out["codes"].shape == (8, 16)
    assert out["latents"].shape == (8, 16)
