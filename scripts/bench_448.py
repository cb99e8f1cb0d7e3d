#!/usr/bin/env python
"""The 448px / 785-token perf point (VERDICT r2 weak-3): ConceptHash on a
ViT-B/16 tower at image_size 448 (28x28 patches + CLS + concept queries),
where the '54-token shapes are intrinsically HBM-bound' analysis from the
224/patch-32 measurements no longer applies — the Pallas attention and
fused-LN kernels are A/B'd here at the shape they were designed for.

    python scripts/bench_448.py            # full grid (TPU, ~10 min)
    SMOKE=1 python scripts/bench_448.py    # tiny single point

Writes scripts/BENCH_448.json and prints one JSON line per point.
Measurement protocol = bench.py (fetch-fenced timing; relay
block_until_ready returns early)."""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from concepthash_tpu.models.clip import AdapterConfig, ClipVisionConfig
from concepthash_tpu.models.concepthash import ConceptHash, ConceptHashConfig

SMOKE = bool(os.environ.get("SMOKE"))


def fence(x):
    leaf = jax.tree_util.tree_leaves(x)[-1]
    np.asarray(jax.device_get(
        leaf if getattr(leaf, "ndim", 0) == 0 else leaf[..., :1]))


def build(attn: str, fused: str):
    if SMOKE:
        vcfg = ClipVisionConfig(hidden_size=128, intermediate_size=256,
                                num_layers=2, num_heads=4, image_size=64,
                                patch_size=16, projection_dim=64,
                                attention_impl=attn, fused_ln=fused)
        ccfg = ConceptHashConfig(nbit=16, nclass=10, ncontext=4,
                                 center_dim=64, text_projection_dims=(64,))
    else:
        # ViT-B/16 @ 448: 784 patch tokens + CLS (+4 concept queries)
        vcfg = ClipVisionConfig(patch_size=16, image_size=448,
                                attention_impl=attn, fused_ln=fused)
        ccfg = ConceptHashConfig(nbit=64, nclass=200)
    center = np.zeros((ccfg.nclass, ccfg.center_dim), np.float32)
    model = ConceptHash(vcfg, ccfg, adapters=AdapterConfig(),
                        fixed_center=center, dtype=jnp.bfloat16)
    return model, vcfg, ccfg


def bench_encode(attn: str, fused: str, batch: int) -> float:
    model, vcfg, _ = build(attn, fused)
    imgs = jnp.zeros((batch, vcfg.image_size, vcfg.image_size, 3),
                     jnp.bfloat16)
    # init on a small sample — init executes an un-donated f32-param forward
    # and OOMs at the bench batch (shapes are independent of init batch)
    small = jnp.zeros((4, vcfg.image_size, vcfg.image_size, 3), jnp.bfloat16)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)}, small,
                           train=False)
    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False)["codes"])
    fence(fwd(variables, imgs))
    fence(fwd(variables, imgs))
    t0 = time.perf_counter()
    out = None
    iters = 2 if SMOKE else 5
    for _ in range(iters):
        out = fwd(variables, imgs)
    fence(out)
    return batch / ((time.perf_counter() - t0) / iters)


def bench_train(attn: str, fused: str, batch: int) -> float:
    from concepthash_tpu.losses.concepthash import lgh_loss
    from concepthash_tpu.train.optim import build_optimizer
    from concepthash_tpu.train.state import create_train_state, make_train_step

    model, vcfg, ccfg = build(attn, fused)
    imgs = jnp.zeros((batch, vcfg.image_size, vcfg.image_size, 3),
                     jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    small = jnp.zeros((4, vcfg.image_size, vcfg.image_size, 3), jnp.bfloat16)
    params = model.init({"params": rng, "dropout": jax.random.fold_in(rng, 1)},
                        small, train=True)["params"]
    tx = build_optimizer({"name": "adam", "lr": 1e-3}, None, 100, 100, params,
                         backbone_lr_scale=0.0)
    state = create_train_state(model, tx, small, rng)
    loss_fn = lambda out, b: lgh_loss(out, b["label"], ncontext=ccfg.ncontext)
    y = np.eye(ccfg.nclass, dtype=np.float32)[
        np.random.default_rng(0).integers(0, ccfg.nclass, batch)]
    b = {"image": imgs, "label": jnp.asarray(y)}
    step = make_train_step(model, loss_fn, tx, donate=False)
    holder = {"state": state}

    def run():
        holder["state"], m = step(holder["state"], b)
        return m["loss"]

    fence(run())
    t0 = time.perf_counter()
    out = None
    iters = 2 if SMOKE else 3
    for _ in range(iters):
        out = run()
    fence(out)
    return batch / ((time.perf_counter() - t0) / iters)


def main():
    enc_batch = 8 if SMOKE else 64
    trn_batch = 8 if SMOKE else 32
    results = {"image_size": 64 if SMOKE else 448,
               "patch": 16, "tokens": (17 if SMOKE else 785) + 4}
    grid = [("xla", "xla")] if SMOKE else [
        ("xla", "xla"), ("pallas", "xla"), ("xla", "pallas"),
        ("xla", "pallas_mlp"), ("pallas", "pallas")]
    for attn, fused in grid:
        key = f"attn={attn},ln={fused}"
        try:
            enc = bench_encode(attn, fused, enc_batch)
            results[key] = {"encode_img_per_s": round(enc, 1)}
            print(json.dumps({key: results[key]}), flush=True)
        except Exception as e:
            results[key] = {"error": str(e)[:200]}
            print(json.dumps({key: results[key]}), flush=True)
    # train point only for the best encode config + the xla baseline
    ok = {k: v for k, v in results.items()
          if isinstance(v, dict) and "encode_img_per_s" in v}
    best = max(ok, key=lambda k: ok[k]["encode_img_per_s"])
    for key in {best, "attn=xla,ln=xla"} & set(ok):
        attn = key.split(",")[0].split("=")[1]
        fused = key.split("=")[-1]
        try:
            results[key]["train_img_per_s"] = round(
                bench_train(attn, fused, trn_batch), 1)
        except Exception as e:
            results[key]["train_error"] = str(e)[:200]
        print(json.dumps({key: results[key]}), flush=True)
    results["encode_batch"] = enc_batch
    results["train_batch"] = trn_batch
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "BENCH_448.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
