"""EMA-teacher pretraining steps: teacher tracks student, losses finite and
collapse-resistant (dino center moves)."""

import numpy as np
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
