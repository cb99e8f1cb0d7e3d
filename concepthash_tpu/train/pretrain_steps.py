"""Custom train steps for EMA-teacher pretraining (MoCo v3, DINO).

The reference's trainers/moco.py:15-111 (momentum encoder + cosine momentum
schedule) and trainers/dino.py:14-227 (student/teacher EMA, centering) carry
missing loss modules upstream; the objectives here follow the papers:

  MoCo v3: symmetric InfoNCE between the student predictor of one view and
  the stop-gradient EMA-teacher projection of the other.
  DINO: cross-entropy between teacher softmax((t - center)/tau_t) and student
  log-softmax(s/tau_s) across views, with an EMA center to prevent collapse.

Teacher params / center live in ``TrainState.extra`` and are updated inside
the same jitted step.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax

from concepthash_tpu.train.state import TrainState

from concepthash_tpu.ops.numerics import l2_normalize


def _ema(old, new, m):
    return jax.tree_util.tree_map(lambda o, n: o * m + n * (1 - m), old, new)


def _cosine_momentum(step, total_steps, base_m):
    frac = jnp.clip(step / jnp.maximum(total_steps, 1), 0.0, 1.0)
    return 1.0 - (1.0 - base_m) * 0.5 * (1.0 + jnp.cos(jnp.pi * frac))


def _copy_tree(tree):
    # teacher must NOT alias the student buffers (donated steps would hand
    # the same buffer in twice)
    return jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), tree)


def init_teacher_extra(state: TrainState) -> TrainState:
    return state.replace(extra={"teacher": _copy_tree(state.params)})


def init_dino_extra(state: TrainState, proj_dim: int) -> TrainState:
    return state.replace(extra={"teacher": _copy_tree(state.params),
                                "center": jnp.zeros((proj_dim,), jnp.float32)})


def make_moco_step(model, tx, preprocess_fn: Callable,
                   base_momentum: float = 0.99, temperature: float = 0.2,
                   total_steps: int = 10000, donate: bool = True):
    def step_fn(state: TrainState, batch: dict):
        rng = jax.random.fold_in(state.rng, state.step)
        k1, k2 = jax.random.split(jax.random.fold_in(rng, 7))
        v1 = preprocess_fn(batch["image"], k1)
        v2 = preprocess_fn(batch["image"], k2)

        def fwd(params, imgs):
            vars_in = {"params": params}
            if state.constants:
                vars_in["constants"] = state.constants
            return model.apply(vars_in, imgs, train=True,
                               rngs={"dropout": rng})

        t1 = jax.lax.stop_gradient(fwd(state.extra["teacher"], v1)["proj"])
        t2 = jax.lax.stop_gradient(fwd(state.extra["teacher"], v2)["proj"])

        def loss_fn(params):
            s1 = fwd(params, v1)["pred"]
            s2 = fwd(params, v2)["pred"]
            loss = 0.5 * (_info_nce(s1, t2, temperature) +
                          _info_nce(s2, t1, temperature))
            return loss, {}

        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        m = _cosine_momentum(state.step.astype(jnp.float32), total_steps,
                             base_momentum)
        teacher = _ema(state.extra["teacher"], params, m)
        new_state = state.replace(step=state.step + 1, params=params,
                                  opt_state=opt, extra={"teacher": teacher})
        return new_state, {"loss": loss, "momentum": m}

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def _info_nce(q, k, temperature):
    qn = l2_normalize(q)
    kn = l2_normalize(k)
    logits = jnp.dot(qn, kn.T, preferred_element_type=jnp.float32) / temperature
    labels = jnp.arange(q.shape[0])
    return optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()


def make_dino_step(model, tx, preprocess_fn: Callable,
                   momentum: float = 0.996, center_momentum: float = 0.9,
                   tau_s: float = 0.1, tau_t: float = 0.04,
                   donate: bool = True):
    def step_fn(state: TrainState, batch: dict):
        rng = jax.random.fold_in(state.rng, state.step)
        k1, k2 = jax.random.split(jax.random.fold_in(rng, 7))
        v1 = preprocess_fn(batch["image"], k1)
        v2 = preprocess_fn(batch["image"], k2)
        center = state.extra["center"]

        def fwd(params, imgs):
            vars_in = {"params": params}
            if state.constants:
                vars_in["constants"] = state.constants
            return model.apply(vars_in, imgs, train=True,
                               rngs={"dropout": rng})["proj"]

        t1 = jax.lax.stop_gradient(fwd(state.extra["teacher"], v1))
        t2 = jax.lax.stop_gradient(fwd(state.extra["teacher"], v2))
        pt1 = jax.nn.softmax((t1 - center) / tau_t, axis=-1)
        pt2 = jax.nn.softmax((t2 - center) / tau_t, axis=-1)

        def loss_fn(params):
            s1 = fwd(params, v1)
            s2 = fwd(params, v2)
            l12 = -(pt1 * jax.nn.log_softmax(s2 / tau_s, -1)).sum(-1).mean()
            l21 = -(pt2 * jax.nn.log_softmax(s1 / tau_s, -1)).sum(-1).mean()
            return 0.5 * (l12 + l21), {}

        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        teacher = _ema(state.extra["teacher"], params, momentum)
        batch_center = jnp.concatenate([t1, t2]).mean(axis=0)
        new_center = center * center_momentum + batch_center * (1 - center_momentum)
        new_state = state.replace(
            step=state.step + 1, params=params, opt_state=opt,
            extra={"teacher": teacher, "center": new_center})
        return new_state, {"loss": loss}

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


# ---------------------------------------------------------------------------
# TBH: adversarial twin-bottleneck (reference trainers/tbh.py:59-67 splits
# actor/critic backward passes; discriminator params+opt ride in extra)
# ---------------------------------------------------------------------------

def init_tbh_extra(state: TrainState, disc, disc_tx, zdim: int, rng) -> TrainState:
    dparams = disc.init(rng, jnp.zeros((1, zdim)))["params"]
    return state.replace(extra={"disc": dparams,
                                "disc_opt": disc_tx.init(dparams)})


def make_tbh_step(model, tx, disc, disc_tx, preprocess_fn: Callable,
                  adv_weight: float = 1.0, donate: bool = True):
    import optax as _optax

    def bce(logits, target):
        return (jax.nn.relu(logits) - logits * target +
                jnp.log1p(jnp.exp(-jnp.abs(logits)))).mean()

    def step_fn(state: TrainState, batch: dict):
        rng = jax.random.fold_in(state.rng, state.step)
        imgs = preprocess_fn(batch["image"], jax.random.fold_in(rng, 7))

        # ---- actor: reconstruction + fool the (frozen) discriminator ----
        def actor_loss(params):
            vars_in = {"params": params}
            if state.constants:
                vars_in["constants"] = state.constants
            out = model.apply(vars_in, imgs, train=True,
                              rngs={"dropout": rng})
            rec = ((out["recon"] -
                    jax.lax.stop_gradient(out["features"])) ** 2).mean()
            d_fake = disc.apply({"params": state.extra["disc"]}, out["z"])
            adv = bce(d_fake, jnp.ones_like(d_fake))  # want D to say "real"
            return rec + adv_weight * adv, (rec, adv, out["z"])

        (loss, (rec, adv, z)), grads = jax.value_and_grad(
            actor_loss, has_aux=True)(state.params)
        updates, opt = tx.update(grads, state.opt_state, state.params)
        params = _optax.apply_updates(state.params, updates)

        # ---- critic: uniform prior vs encoder z ----
        prior = jax.random.uniform(jax.random.fold_in(rng, 11), z.shape)
        zs = jax.lax.stop_gradient(z)

        def critic_loss(dparams):
            d_real = disc.apply({"params": dparams}, prior)
            d_fake = disc.apply({"params": dparams}, zs)
            return bce(d_real, jnp.ones_like(d_real)) + \
                bce(d_fake, jnp.zeros_like(d_fake))

        dloss, dgrads = jax.value_and_grad(critic_loss)(state.extra["disc"])
        dupd, dopt = disc_tx.update(dgrads, state.extra["disc_opt"],
                                    state.extra["disc"])
        dparams = _optax.apply_updates(state.extra["disc"], dupd)

        new_state = state.replace(step=state.step + 1, params=params,
                                  opt_state=opt,
                                  extra={"disc": dparams, "disc_opt": dopt})
        return new_state, {"loss": loss, "rec": rec, "adv": adv,
                           "disc": dloss}

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())
