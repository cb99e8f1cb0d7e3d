#!/usr/bin/env python
"""Large-batch train throughput: does per-layer rematerialization
(ClipVisionConfig.remat — jax.checkpoint on encoder layers) lift the b1024
ConceptHash train step? Round-2 measured b1024 SLOWER per-image than b256
(3.1k vs 4.0k img/s) and attributed it to backward-activation HBM pressure;
remat trades those activations for recompute FLOPs — the standard TPU fix.

    python scripts/bench_remat.py      # TPU, ~10 min
Writes scripts/BENCH_REMAT.json."""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from concepthash_tpu.losses.concepthash import lgh_loss
from concepthash_tpu.models.clip import AdapterConfig, ClipVisionConfig
from concepthash_tpu.models.concepthash import ConceptHash, ConceptHashConfig
from concepthash_tpu.train.optim import build_optimizer
from concepthash_tpu.train.state import create_train_state, make_train_step


def fence(x):
    leaf = jax.tree_util.tree_leaves(x)[-1]
    np.asarray(jax.device_get(
        leaf if getattr(leaf, "ndim", 0) == 0 else leaf[..., :1]))


def bench(batch: int, remat: bool) -> float:
    vcfg = ClipVisionConfig(remat=remat)  # ViT-B/32 @224
    ccfg = ConceptHashConfig(nbit=64, nclass=200)
    center = np.zeros((ccfg.nclass, ccfg.center_dim), np.float32)
    model = ConceptHash(vcfg, ccfg, adapters=AdapterConfig(),
                        fixed_center=center, dtype=jnp.bfloat16)
    small = jnp.zeros((8, 224, 224, 3), jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    params = model.init({"params": rng, "dropout": jax.random.fold_in(rng, 1)},
                        small, train=True)["params"]
    tx = build_optimizer({"name": "adam", "lr": 1e-3}, None, 100, 100, params,
                         backbone_lr_scale=0.0)
    state = create_train_state(model, tx, small, rng)
    loss_fn = lambda out, b: lgh_loss(out, b["label"], ncontext=ccfg.ncontext)
    y = np.eye(ccfg.nclass, dtype=np.float32)[
        np.random.default_rng(0).integers(0, ccfg.nclass, batch)]
    b = {"image": jnp.zeros((batch, 224, 224, 3), jnp.bfloat16),
         "label": jnp.asarray(y)}
    step = make_train_step(model, loss_fn, tx, donate=False)
    holder = {"state": state}

    def run():
        holder["state"], m = step(holder["state"], b)
        return m["loss"]

    fence(run())
    t0 = time.perf_counter()
    out = None
    for _ in range(3):
        out = run()
    fence(out)
    return batch / ((time.perf_counter() - t0) / 3)


def main():
    results = {}
    for batch in (256, 1024):
        for remat in (False, True):
            key = f"b{batch},remat={remat}"
            try:
                results[key] = round(bench(batch, remat), 1)
            except Exception as e:
                results[key] = f"error: {str(e)[:150]}"
            print(json.dumps({key: results[key]}), flush=True)
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "BENCH_REMAT.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
