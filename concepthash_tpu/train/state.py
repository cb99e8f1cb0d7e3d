"""Train state pytree + mesh-aware step builders.

The reference's mutable trainer objects (trainers/base.py) become a single
immutable pytree stepped by pure jitted functions. Data parallelism is pjit
over a ``Mesh(('data',))``: the batch is sharded on 'data', params/state are
replicated, and XLA inserts the gradient all-reduce (SURVEY.md §5.8 —
training is deliberately pure DP; a ViT-B needs no TP/PP).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    constants: Any
    opt_state: Any
    rng: jax.Array
    # method-owned auxiliary state (EMA teacher params, DINO center, ...)
    extra: Any = flax.struct.field(default_factory=dict)

    def variables(self) -> dict:
        v = {"params": self.params}
        if self.batch_stats:
            v["batch_stats"] = self.batch_stats
        if self.constants:
            v["constants"] = self.constants
        return v


def create_train_state(model, tx, sample_batch, rng,
                       init_train: bool = True,
                       variables: dict | None = None) -> TrainState:
    """``variables``: pass the result of an identical ``model.init`` already
    performed (same rng derivation below) to avoid a second full-model init
    — minutes for ViT-B-sized models on a 1-core host."""
    if variables is None:
        init_rngs = {"params": rng, "dropout": jax.random.fold_in(rng, 1)}
        variables = model.init(init_rngs, sample_batch, train=init_train)
    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        constants=variables.get("constants", {}),
        opt_state=tx.init(params),
        rng=jax.random.fold_in(rng, 2),
    )


def _build_step_fn(model, loss_fn: Callable, tx,
                   output_attentions: bool = False,
                   preprocess_fn: Optional[Callable] = None):
    """The pure (state, batch) -> (state, metrics) transition shared by the
    single-step and scan-chunked train steps."""

    def step_fn(state: TrainState, batch: dict):
        rng = jax.random.fold_in(state.rng, state.step)
        images = batch["image"]
        if preprocess_fn is not None:
            images = preprocess_fn(images, jax.random.fold_in(rng, 7))

        def compute(params):
            vars_in = {"params": params}
            if state.batch_stats:
                vars_in["batch_stats"] = state.batch_stats
            if state.constants:
                vars_in["constants"] = state.constants
            out, mutated = model.apply(
                vars_in, images, train=True,
                output_attentions=output_attentions,
                rngs={"dropout": rng}, mutable=["batch_stats"])
            total, parts = loss_fn(out, batch)
            return total, (parts, mutated.get("batch_stats", state.batch_stats), out)

        (total, (parts, new_bs, out)), grads = jax.value_and_grad(
            compute, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  batch_stats=new_bs, opt_state=new_opt)
        metrics = {"loss": total, **parts, **accuracy_metrics(out, batch["label"])}
        return new_state, metrics

    return step_fn


def make_train_step(model, loss_fn: Callable, tx,
                    mesh: Optional[Mesh] = None,
                    output_attentions: bool = False,
                    donate: bool = True,
                    preprocess_fn: Optional[Callable] = None):
    """loss_fn(outputs, batch) -> (total, parts_dict).

    Returns step(state, batch) -> (state, metrics); batch is a dict with at
    least image (B,H,W,C) and label (B,C) one-hot f32. ``preprocess_fn(images,
    rng)`` (optional) runs the fused device augmentation inside the same jit,
    so raw uint8 crosses host->device and every float op fuses on-chip.

    Sharding is carried by the committed placement of the inputs (state
    replicated via mesh.replicate, batch sharded via mesh.shard_batch);
    GSPMD partitions the computation and inserts the gradient all-reduce.
    """
    step_fn = _build_step_fn(model, loss_fn, tx,
                             output_attentions=output_attentions,
                             preprocess_fn=preprocess_fn)
    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_multi_train_step(model, loss_fn: Callable, tx,
                          mesh: Optional[Mesh] = None,
                          output_attentions: bool = False,
                          donate: bool = True,
                          preprocess_fn: Optional[Callable] = None):
    """K optimizer steps per device dispatch via ``lax.scan``.

    Returns multi_step(state, batches) -> (state, metrics) where every leaf of
    ``batches`` is stacked (K, B, ...) and every metric comes back stacked
    (K,). One jit call executes all K steps on-device, amortizing the per-step
    host->device dispatch (on the TPU relay the dominant fixed cost; the
    reference pays it per batch, trainers/base.py step loop). RNG correctness
    is preserved because the step folds ``state.step`` — which advances inside
    the scan — into ``state.rng``.
    """
    step_fn = _build_step_fn(model, loss_fn, tx,
                             output_attentions=output_attentions,
                             preprocess_fn=preprocess_fn)

    def multi_step(state: TrainState, batches: dict):
        return jax.lax.scan(step_fn, state, batches)

    return jax.jit(multi_step, donate_argnums=(0,) if donate else ())


def _build_eval_fn(model, loss_fn: Optional[Callable],
                   codes_key: str, preprocess_fn: Optional[Callable]):
    def step_fn(state: TrainState, batch: dict):
        images = batch["image"]
        if preprocess_fn is not None:
            images = preprocess_fn(images, None)
        out = model.apply(state.variables(), images, train=False)
        metrics = {}
        if loss_fn is not None:
            total, parts = loss_fn(out, batch)
            metrics = {"loss": total, **parts,
                       **accuracy_metrics(out, batch["label"])}
        codes = {k: v for k, v in out.items() if codes_key in k and v.ndim == 2}
        return codes, metrics

    return step_fn


def make_eval_step(model, loss_fn: Optional[Callable] = None,
                   mesh: Optional[Mesh] = None, codes_key: str = "codes",
                   preprocess_fn: Optional[Callable] = None):
    """eval step: forward in inference mode, returns (codes, metrics)."""
    return jax.jit(_build_eval_fn(model, loss_fn, codes_key, preprocess_fn))


def make_multi_eval_step(model, loss_fn: Optional[Callable] = None,
                         mesh: Optional[Mesh] = None, codes_key: str = "codes",
                         preprocess_fn: Optional[Callable] = None):
    """K eval batches per device dispatch via ``lax.scan`` — the encode path
    (database extraction dominates every evaluation epoch) pays the same
    per-step relay dispatch the train loop did. Batches stacked (K, B, ...);
    codes/metrics come back stacked (K, ...)."""
    eval_fn = _build_eval_fn(model, loss_fn, codes_key, preprocess_fn)

    def multi(state: TrainState, batches: dict):
        def body(carry, batch):
            return carry, eval_fn(carry, batch)

        _, (codes, metrics) = jax.lax.scan(body, state, batches)
        return codes, metrics

    return jax.jit(multi)


def accuracy_metrics(outputs: dict, onehot) -> dict:
    """Top-1 accuracy for every '*logits*' output; 3-D (Q,B,C) logits are
    concept-averaged first (reference trainers/coop.py:137-148)."""
    y = jnp.argmax(onehot, axis=-1)
    metrics = {}
    for key, val in outputs.items():
        if "logits" not in key or not hasattr(val, "ndim"):
            continue
        if val.ndim == 3:
            pred = val.mean(axis=0).argmax(axis=-1)
        elif val.ndim == 2:
            pred = val.argmax(axis=-1)
        else:
            continue
        suffix = key.split("_", 1)[1] if "_" in key else key[len("logits"):]
        name = "acc" if key == "logits" else f"acc_{suffix}"
        metrics[name] = (pred == y).mean()
    return metrics
