"""EMA-teacher pretraining steps: teacher tracks student, losses finite and
collapse-resistant (dino center moves)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from concepthash_tpu import methods as M
from concepthash_tpu.train.optim import build_optimizer
from concepthash_tpu.train.state import create_train_state

BB = {"name": "tiny", "pretrained": False, "hidden_size": 32,
      "intermediate_size": 64, "num_layers": 2, "num_heads": 4,
      "patch_size": 8, "image_size": 16, "projection_dim": 32}


def setup(name):
    cfg = {"model": {"name": name, "nbit": 8, "nclass": 4, "hidden_dim": 16,
                     "has_adapter": False},
           "backbone": BB, "criterion": {"name": name},
           "dataset": {"multiclass": False}, "seed": 0}
    method = M.get_method(name)
    model = method.build_model(cfg, None)
    sample = jnp.zeros((8, 16, 16, 3))
    k = jax.random.PRNGKey(0)
    params = model.init({"params": k, "dropout": jax.random.fold_in(k, 1)},
                        sample, train=True)["params"]
    tx = build_optimizer({"name": "sgd", "lr": 0.05, "momentum": 0.9}, None,
                         2, 2, params, 1.0)
    state = create_train_state(model, tx, sample, k)
    state = method.init_extra(state, cfg)
    pp = lambda imgs, rng: imgs.astype(jnp.float32)
    step = method.custom_step(model, cfg, tx, pp, total_steps=10)
    return state, step


def test_moco_step(rng):
    state, step = setup("moco")
    t0 = np.asarray(jax.device_get(state.extra["teacher"]["proj_fc2"]["kernel"])).copy()
    batch = {"image": jnp.asarray(rng.standard_normal((8, 16, 16, 3)),
                                  jnp.float32)}
    for _ in range(3):
        state, metrics = step(state, batch)
        assert np.isfinite(float(metrics["loss"]))
    t1 = np.asarray(jax.device_get(state.extra["teacher"]["proj_fc2"]["kernel"]))
    assert not np.allclose(t0, t1)  # teacher moved via EMA


def test_dino_step(rng):
    state, step = setup("dino")
    c0 = np.asarray(jax.device_get(state.extra["center"])).copy()
    batch = {"image": jnp.asarray(rng.standard_normal((8, 16, 16, 3)),
                                  jnp.float32)}
    for _ in range(3):
        state, metrics = step(state, batch)
        assert np.isfinite(float(metrics["loss"]))
    c1 = np.asarray(jax.device_get(state.extra["center"]))
    assert not np.allclose(c0, c1)  # center updated


def test_mae_forward_and_loss(rng):
    from concepthash_tpu.models.mae import MAE, MAEConfig, mae_loss

    cfg = MAEConfig(image_size=16, patch_size=8, enc_dim=32, enc_layers=2,
                    enc_heads=4, dec_dim=16, dec_layers=1, dec_heads=4,
                    mask_ratio=0.5)
    model = MAE(cfg)
    imgs = jnp.asarray(rng.standard_normal((2, 16, 16, 3)), jnp.float32)
    k = jax.random.PRNGKey(0)
    vs = model.init({"params": k, "dropout": jax.random.fold_in(k, 1)},
                    imgs, train=True)
    out = model.apply(vs, imgs, train=True,
                      rngs={"dropout": jax.random.PRNGKey(2)})
    P = cfg.num_patches
    assert out["recon"].shape == (2, P, cfg.patch_dim)
    assert out["mask"].shape == (2, P)
    # mask ratio honored: exactly P - n_keep masked per image
    n_masked = int(np.asarray(out["mask"]).sum(axis=1)[0])
    assert n_masked == P - max(1, int(P * 0.5))
    loss, parts = mae_loss(out, None)
    assert np.isfinite(float(loss)) and float(loss) > 0
    # eval mode: full tokens, codes present, no recon
    ev = model.apply(vs, imgs, train=False)
    assert ev["codes"].shape == (2, 32)
    assert "recon" not in ev


def test_mae_loss_only_on_masked(rng):
    from concepthash_tpu.models.mae import mae_loss

    recon = jnp.zeros((1, 4, 6))
    target = jnp.ones((1, 4, 6))
    mask = jnp.asarray([[1.0, 0.0, 0.0, 0.0]])
    loss, _ = mae_loss({"recon": recon, "target": target, "mask": mask}, None)
    assert float(loss) == pytest.approx(1.0)

