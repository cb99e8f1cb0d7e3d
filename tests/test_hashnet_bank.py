"""HashNet option fill-ins: beta-continuation schedule + keep_train_size
memory bank (reference trainers/hashnet.py:14-17, models/loss/hashnet.py:36-70)
and the LGHv3 contrastive-diagonal loss registration (loss/coop.py:346-352)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from concepthash_tpu.methods import get_method
from concepthash_tpu.train.optim import build_optimizer
from concepthash_tpu.train.state import create_train_state

BACKBONE = {"name": "tiny", "hidden_size": 32, "intermediate_size": 64,
            "num_layers": 2, "num_heads": 4, "patch_size": 8,
            "image_size": 16, "projection_dim": 32}


def _cfg(keep=1, epochs=4):
    return {"model": {"name": "hashnet", "nbit": 8, "nclass": 3,
                      "has_adapter": True, "adapter_bottleneck_dim": 8},
            "backbone": BACKBONE,
            "criterion": {"name": "hashnet", "alpha": 1.0, "beta": 1.0,
                          "step_continuation": 2, "keep_train_size": keep},
            "optim": {"name": "sgd", "lr": 0.01},
            "epochs": epochs, "_train_size_": 12}


def _setup(cfg):
    m = get_method("hashnet")
    model = m.build_model(cfg, None)
    imgs = jnp.zeros((4, 16, 16, 3))
    rng = jax.random.PRNGKey(0)
    params = model.init({"params": rng, "dropout": jax.random.fold_in(rng, 1)},
                        imgs, train=True)["params"]
    tx = build_optimizer(cfg["optim"], {"name": "no_decay"}, cfg["epochs"],
                         1, params)
    state = create_train_state(model, tx, imgs, rng)
    state = m.init_extra(state, cfg)
    # steps_per_epoch = total // epochs = 1
    step = m.custom_step(model, cfg, tx, None, cfg["epochs"])
    return model, state, step


def _batch(rng, idx):
    n = len(idx)
    return {"image": jnp.asarray(rng.standard_normal((n, 16, 16, 3)),
                                 jnp.float32),
            "label": jnp.asarray(np.eye(3, dtype=np.float32)[rng.integers(0, 3, n)]),
            "index": jnp.asarray(idx, jnp.int32)}


def test_memory_bank_fills_and_loss_finite():
    cfg = _cfg(keep=1)
    model, state, step = _setup(cfg)
    assert state.extra["U"].shape == (12, 8)
    rng = np.random.default_rng(0)
    state, m1 = step(state, _batch(rng, [0, 1, 2, 3]))
    state, m2 = step(state, _batch(rng, [4, 5, 6, 7]))
    U = np.asarray(state.extra["U"])
    # visited rows are tanh codes (nonzero), unvisited rows still zero
    assert np.abs(U[:8]).max() > 0
    assert np.abs(U[8:]).max() == 0
    assert np.isfinite(float(m2["loss"]))


def test_beta_continuation_schedule():
    """beta = sqrt(ep // step_continuation + 1) — with steps_per_epoch=1 and
    step_continuation=2: steps 0,1 -> 1.0; steps 2,3 -> sqrt(2)."""
    cfg = _cfg(keep=0)
    model, state, step = _setup(cfg)
    rng = np.random.default_rng(1)
    betas = []
    for i in range(4):
        state, metrics = step(state, _batch(rng, [0, 1, 2, 3]))
        betas.append(float(metrics["beta"]))
    assert betas[0] == pytest.approx(1.0)
    assert betas[1] == pytest.approx(1.0)
    assert betas[2] == pytest.approx(np.sqrt(2.0))
    assert betas[3] == pytest.approx(np.sqrt(2.0))


def test_bank_pairs_affect_loss():
    """After the bank holds other rows, the loss must depend on them: two
    steps with identical batches give different losses once the bank differs."""
    cfg = _cfg(keep=1)
    model, state, step = _setup(cfg)
    rng = np.random.default_rng(2)
    b = _batch(rng, [0, 1, 2, 3])
    s1, m1 = step(state, b)
    # fill distant rows with strongly labeled codes, then repeat the batch
    other = _batch(rng, [8, 9, 10, 11])
    s2, _ = step(s1, other)
    _, m3 = step(s2, b)
    assert float(m1["loss"]) != pytest.approx(float(m3["loss"]))


def test_lghv3_diagonal_labels():
    from concepthash_tpu.methods import get_method

    cfg = {"model": {"name": "concepthash", "nbit": 8, "nclass": 4,
                     "ncontext": 4, "concept_reg": False},
           "criterion": {"name": "lghv3", "margin": 0.2, "scale": 8,
                         "loss_scales": {"bin_logits": 1, "cont_logits": 1,
                                         "concept_logits": 0}}}
    loss_fn = get_method("concepthash").build_loss(cfg, None)
    rng = np.random.default_rng(3)
    B = 4  # contrastive: logits class axis == batch
    outputs = {"codes": jnp.asarray(rng.standard_normal((B, 8)), jnp.float32),
               "logits_cont": jnp.asarray(rng.standard_normal((B, B)) * 0.1,
                                          jnp.float32),
               "logits_bin": jnp.asarray(rng.standard_normal((B, B)) * 0.1,
                                         jnp.float32)}
    # labels in the batch are IGNORED — v3 uses the diagonal
    wrong_labels = jnp.asarray(np.eye(B, dtype=np.float32)[::-1])
    total, parts = loss_fn(outputs, {"label": wrong_labels})
    diag_labels = jnp.asarray(np.eye(B, dtype=np.float32))
    total2, _ = loss_fn(outputs, {"label": diag_labels})
    assert float(total) == pytest.approx(float(total2))
    assert np.isfinite(float(total))
