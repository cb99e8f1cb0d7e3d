#!/usr/bin/env python
"""Benchmark: 64-bit Hamming retrieval QPS (sharded-gallery popcount kernel)
and ViT-B/32 encode throughput on the available accelerator.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

vs_baseline is measured in-run: the same retrieval workload on host NumPy
(the reference has no published numbers — SURVEY.md §6; its retrieval scoring
ran on a single GPU/CPU with dense float distance matrices). North star
(BASELINE.json): >10x CPU retrieval QPS; speed-of-light encode.

Usage: python bench.py [--smoke]   (--smoke: tiny sizes, CPU-safe, for CI)
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def time_it(fn, warmup: int = 2, iters: int = 5) -> float:
    """fn() must RETURN its device result. Synchronization is a host fetch of
    (a slice of) the last result — on this TPU relay, ``block_until_ready``
    returns before execution completes, so fetch is the only reliable fence.
    """
    for _ in range(warmup):
        _fetch(fn())
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn()
    _fetch(out)
    return (time.perf_counter() - t0) / iters


def _fetch(out):
    import jax

    leaf = jax.tree_util.tree_leaves(out)[-1]
    if hasattr(leaf, "__array__"):
        # tiny D2H fetch = completion fence
        np.asarray(leaf if getattr(leaf, "ndim", 0) == 0 else leaf[..., :1])


def bench_retrieval(jnp, jax, n_db: int, n_q: int, nbit: int = 64,
                    topk: int = 100, chunk: int = 512, exact: bool = False):
    """MXU sign-matmul distances + top-k (the serving path,
    ops.retrieval.retrieve_topk; see its docstring for the measured
    popcount/top_k/approx_min_k tradeoffs). exact=True benches the
    deterministic lax.top_k path instead of approx_min_k (recall 0.95)."""
    from concepthash_tpu.ops.retrieval import retrieve_topk

    rng = np.random.default_rng(0)
    db = jnp.asarray(np.sign(rng.standard_normal((n_db, nbit))), jnp.bfloat16)
    q = jnp.asarray(np.sign(rng.standard_normal((n_q, nbit))), jnp.float32)

    def run():
        return [retrieve_topk(q[s:s + chunk], db, k=topk, exact=exact)
                for s in range(0, n_q, chunk)]

    sec = time_it(run, warmup=2, iters=10)  # relay timing is noisy; average more
    return n_q / sec


def pack_np(rng, n, nbit):
    bits = rng.integers(0, 2, (n, nbit), dtype=np.uint32)
    lanes = nbit // 32
    bits = bits.reshape(n, lanes, 32)
    return (bits << np.arange(32, dtype=np.uint32)).sum(-1).astype(np.uint32)


_POP = np.array([bin(i).count("1") for i in range(65536)], np.int32)


def bench_retrieval_cpu(n_db: int, n_q: int, nbit: int = 64, topk: int = 100):
    """Host NumPy baseline: vectorized popcount via 16-bit lookup."""
    rng = np.random.default_rng(0)
    db = pack_np(rng, n_db, nbit)
    q = pack_np(rng, n_q, nbit)

    def run():
        x = np.bitwise_xor(q[:, None, :], db[None, :, :])
        lo = _POP[(x & 0xFFFF).astype(np.int64)]
        hi = _POP[(x >> 16).astype(np.int64)]
        d = (lo + hi).sum(-1)
        return np.argpartition(d, topk, axis=1)[:, :topk]

    sec = time_it(run, warmup=1, iters=2)
    return n_q / sec


def bench_encode(jax, jnp, batch: int, tiny: bool):
    from concepthash_tpu.models.clip import AdapterConfig, ClipVisionConfig
    from concepthash_tpu.models.concepthash import ConceptHash, ConceptHashConfig

    if tiny:
        vcfg = ClipVisionConfig(hidden_size=64, intermediate_size=128,
                                num_layers=2, num_heads=4, image_size=32,
                                patch_size=8, projection_dim=32)
        ccfg = ConceptHashConfig(nbit=16, nclass=10, ncontext=4, center_dim=32,
                                 text_projection_dims=(32,))
    else:
        vcfg = ClipVisionConfig()  # ViT-B/32 geometry
        ccfg = ConceptHashConfig(nbit=64, nclass=200)
    center = np.zeros((ccfg.nclass, ccfg.center_dim), np.float32)
    model = ConceptHash(vcfg, ccfg, adapters=AdapterConfig(),
                        fixed_center=jnp.asarray(center), dtype=jnp.bfloat16)
    imgs = jnp.zeros((batch, vcfg.image_size, vcfg.image_size, 3), jnp.bfloat16)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)}, imgs, train=False)
    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False)["codes"])

    sec = time_it(lambda: fwd(variables, imgs))
    return batch / sec


def bench_train_step(jax, jnp, batch: int, tiny: bool, chunk: int = 1):
    """Full ConceptHash train step (fwd+bwd+adam) images/sec.

    chunk>1 measures the production scan-chunked path (train_chunk config,
    train/state.make_multi_train_step): K optimizer steps per dispatch,
    amortizing the per-step relay dispatch latency."""
    from concepthash_tpu.losses.concepthash import lgh_loss
    from concepthash_tpu.models.clip import AdapterConfig, ClipVisionConfig
    from concepthash_tpu.models.concepthash import ConceptHash, ConceptHashConfig
    from concepthash_tpu.train.optim import build_optimizer
    from concepthash_tpu.train.state import (create_train_state,
                                             make_multi_train_step,
                                             make_train_step)

    if tiny:
        vcfg = ClipVisionConfig(hidden_size=64, intermediate_size=128,
                                num_layers=2, num_heads=4, image_size=32,
                                patch_size=8, projection_dim=32)
        ccfg = ConceptHashConfig(nbit=16, nclass=10, ncontext=4, center_dim=32,
                                 text_projection_dims=(32,))
    else:
        vcfg = ClipVisionConfig()
        ccfg = ConceptHashConfig(nbit=64, nclass=200)
    center = np.zeros((ccfg.nclass, ccfg.center_dim), np.float32)
    model = ConceptHash(vcfg, ccfg, adapters=AdapterConfig(),
                        fixed_center=jnp.asarray(center), dtype=jnp.bfloat16)
    imgs = jnp.zeros((batch, vcfg.image_size, vcfg.image_size, 3), jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    params = model.init({"params": rng, "dropout": jax.random.fold_in(rng, 1)},
                        imgs, train=True)["params"]
    tx = build_optimizer({"name": "adam", "lr": 1e-3}, None, 100, 100, params,
                         backbone_lr_scale=0.0)
    state = create_train_state(model, tx, imgs, rng)
    loss_fn = lambda out, b: lgh_loss(out, b["label"], ncontext=ccfg.ncontext)
    y = np.eye(ccfg.nclass, dtype=np.float32)[
        np.random.default_rng(0).integers(0, ccfg.nclass, batch)]
    b = {"image": imgs, "label": jnp.asarray(y)}
    holder = {"state": state}

    if chunk > 1:
        step = make_multi_train_step(model, loss_fn, tx, donate=False)
        bk = {k: jnp.broadcast_to(v, (chunk,) + v.shape) for k, v in b.items()}

        def run():
            holder["state"], metrics = step(holder["state"], bk)
            return metrics["loss"][-1]
    else:
        step = make_train_step(model, loss_fn, tx, donate=False)

        def run():
            holder["state"], metrics = step(holder["state"], b)
            return metrics["loss"]

    sec = time_it(run, warmup=1, iters=3)
    return batch * chunk / sec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    backend = jax.default_backend()
    if args.smoke:
        n_db, n_q, cpu_db = 20_000, 256, 20_000
        batch = 16
    else:
        n_db, n_q, cpu_db = 1_000_000, 2048, 100_000
        batch = 1024

    qps = bench_retrieval(jnp, jax, n_db, n_q)
    qps_exact = bench_retrieval(jnp, jax, n_db, n_q, exact=True)
    # Single-core host NumPy baseline (this box has 1 CPU core), measured on
    # a cpu_db-entry gallery and scaled linearly to the device gallery size
    # (the distance pass is O(Q*N); argpartition is O(Q*N) too).
    cpu_qps_raw = bench_retrieval_cpu(cpu_db, min(n_q, 64))
    cpu_qps = cpu_qps_raw * (cpu_db / n_db)
    try:
        enc = bench_encode(jax, jnp, batch, tiny=args.smoke)
    except Exception as e:  # encode bench is auxiliary
        print(f"encode bench failed: {e}", file=sys.stderr)
        enc = None
    try:
        trn = bench_train_step(jax, jnp, min(batch, 256), tiny=args.smoke)
    except Exception as e:
        print(f"train bench failed: {e}", file=sys.stderr)
        trn = None
    try:  # production path: train_chunk steps per dispatch (lax.scan)
        trn_chunk = bench_train_step(jax, jnp, min(batch, 256),
                                     tiny=args.smoke,
                                     chunk=4 if args.smoke else 16)
    except Exception as e:
        print(f"chunked train bench failed: {e}", file=sys.stderr)
        trn_chunk = None
    trn_big = None
    if not args.smoke:
        try:  # MXU-saturating batch (throughput-oriented config)
            trn_big = bench_train_step(jax, jnp, 1024, tiny=False, chunk=4)
        except Exception as e:
            print(f"b1024 train bench failed: {e}", file=sys.stderr)

    result = {
        "metric": f"hamming64_retrieval_qps_{n_db // 1000}k_gallery",
        "value": round(qps, 1),
        "unit": "queries/s",
        "vs_baseline": round(qps / cpu_qps, 2),
        "backend": backend,
        "exact_topk_qps": round(qps_exact, 1),
        "cpu_numpy_qps_1core": round(cpu_qps, 1),
        "encode_img_per_s": round(enc, 1) if enc else None,
        "encode_batch": batch,
        "train_img_per_s": round(trn_chunk, 1) if trn_chunk else None,
        "train_img_per_s_single_dispatch": round(trn, 1) if trn else None,
        "train_img_per_s_b1024": round(trn_big, 1) if trn_big else None,
        "train_chunk": 4 if args.smoke else 16,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
