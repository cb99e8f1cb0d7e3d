"""Optimizer + LR-schedule factories and the backbone-freeze policy.

Config surface mirrors the reference groups (configs/optim/{adam,adamw,sgd}.yaml
and configs/scheduler/{csw,step,milestones,no_decay}.yaml) with the reference's
epoch-granularity semantics: the LR changes once per epoch
(reference trainers/base.py:356 steps the scheduler per epoch, and the missing
``utils.lr_scheduler.cosine_decay_linear_warmup`` is reconstructed per
SURVEY.md §2.9).

``backbone_lr_scale`` implements the reference's param-group policy
(trainers/base.py:133-170): 0 freezes the backbone (adapters and heads still
train), otherwise the backbone group runs at ``lr * scale``. Frozen params get
``optax.set_to_zero`` — no optimizer state is allocated for them, which for a
frozen ViT-B is most of the memory the reference wastes.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax


# ---------------------------------------------------------------------------
# epoch-granularity schedules (value = multiplier of base lr)
# ---------------------------------------------------------------------------

def cosine_decay_linear_warmup(epochs: int, warmup_epochs: int = 10) -> Callable:
    def mult(ep):
        warm = (ep + 1.0) / max(warmup_epochs, 1)
        span = max(epochs - warmup_epochs, 1)
        cos = 0.5 * (1.0 + jnp.cos(jnp.pi * (ep - warmup_epochs) / span))
        return jnp.where(ep < warmup_epochs, jnp.minimum(warm, 1.0), cos)

    return mult


def step_decay(step_size: int, gamma: float = 0.1) -> Callable:
    return lambda ep: gamma ** (ep // step_size)


def milestones_decay(milestones: list, gamma: float = 0.1) -> Callable:
    ms = jnp.asarray(sorted(int(m) for m in milestones))
    return lambda ep: gamma ** jnp.sum(ep >= ms)


def no_decay() -> Callable:
    return lambda ep: jnp.ones_like(jnp.asarray(ep, jnp.float32))


def build_schedule(scheduler_cfg: dict | None, epochs: int,
                   steps_per_epoch: int, base_lr: float) -> Callable:
    """Returns an optax-style lr(step) with the epoch-granularity multiplier."""
    name = (scheduler_cfg or {}).get("name", "csw")
    if name in ("csw", "cosine", "cosine_decay_linear_warmup"):
        mult = cosine_decay_linear_warmup(
            epochs, int((scheduler_cfg or {}).get("warmup_epochs", 10)))
    elif name == "step":
        mult = step_decay(int(scheduler_cfg.get("step_size", 30)),
                          float(scheduler_cfg.get("gamma", 0.1)))
    elif name == "milestones":
        mult = milestones_decay(scheduler_cfg.get("milestones", []),
                                float(scheduler_cfg.get("gamma", 0.1)))
    elif name in ("no_decay", "none", "constant"):
        mult = no_decay()
    else:
        raise ValueError(f"unknown scheduler {name!r}")

    def lr(step):
        ep = jnp.asarray(step, jnp.float32) // max(steps_per_epoch, 1)
        return base_lr * mult(ep)

    return lr


# ---------------------------------------------------------------------------
# optimizers (torch-parity update rules)
# ---------------------------------------------------------------------------

def _base_optimizer(optim_cfg: dict, lr: Callable) -> optax.GradientTransformation:
    name = optim_cfg.get("name", "adam")
    wd = float(optim_cfg.get("weight_decay", 0.0))
    if name == "adam":
        # torch.optim.Adam couples weight decay into the gradient
        chain = []
        if wd:
            chain.append(optax.add_decayed_weights(wd))
        chain += [optax.scale_by_adam(
            b1=float(optim_cfg.get("beta1", 0.9)),
            b2=float(optim_cfg.get("beta2", 0.999)),
            eps=float(optim_cfg.get("eps", 1e-8))),
            optax.scale_by_learning_rate(lr)]
        return optax.chain(*chain)
    if name == "adamw":
        return optax.adamw(lr, b1=float(optim_cfg.get("beta1", 0.9)),
                           b2=float(optim_cfg.get("beta2", 0.999)),
                           eps=float(optim_cfg.get("eps", 1e-8)),
                           weight_decay=wd)
    if name == "sgd":
        chain = []
        if wd:
            chain.append(optax.add_decayed_weights(wd))
        mom = float(optim_cfg.get("momentum", 0.0))
        if mom:
            chain.append(optax.trace(decay=mom,
                                     nesterov=bool(optim_cfg.get("nesterov", False))))
        chain.append(optax.scale_by_learning_rate(lr))
        return optax.chain(*chain)
    if name == "lars":
        return optax.lars(lr, weight_decay=wd,
                          momentum=float(optim_cfg.get("momentum", 0.9)))
    raise ValueError(f"unknown optimizer {name!r}")


def _is_backbone_path(path) -> bool:
    keys = [getattr(p, "key", getattr(p, "name", "")) for p in path]
    if not keys or keys[0] != "backbone":
        return False
    return not any("adapter" in str(k) for k in keys)


def param_labels(params) -> dict:
    """'backbone' for non-adapter backbone params, 'train' for the rest."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: "backbone" if _is_backbone_path(path) else "train", params)


def build_optimizer(optim_cfg: dict, scheduler_cfg: dict | None, epochs: int,
                    steps_per_epoch: int, params,
                    backbone_lr_scale: float = 1.0) -> optax.GradientTransformation:
    base_lr = float(optim_cfg.get("lr", 1e-4))
    lr = build_schedule(scheduler_cfg, epochs, steps_per_epoch, base_lr)

    labels = param_labels(params)
    flat = jax.tree_util.tree_leaves(labels)
    if backbone_lr_scale == 1.0 or "backbone" not in flat:
        return _base_optimizer(optim_cfg, lr)

    if backbone_lr_scale == 0.0:
        backbone_tx = optax.set_to_zero()
    else:
        scaled = build_schedule(scheduler_cfg, epochs, steps_per_epoch,
                                base_lr * float(backbone_lr_scale))
        backbone_tx = _base_optimizer(optim_cfg, scaled)

    return optax.multi_transform(
        {"train": _base_optimizer(optim_cfg, lr), "backbone": backbone_tx},
        labels)


def current_lr(optim_cfg: dict, scheduler_cfg: dict | None, epochs: int,
               steps_per_epoch: int, step: int) -> float:
    """Host-side LR readback for logging (reference get_learning_rate,
    trainers/base.py:42-46)."""
    lr = build_schedule(scheduler_cfg, epochs, steps_per_epoch,
                        float(optim_cfg.get("lr", 1e-4)))
    return float(lr(step))
