#!/usr/bin/env python
"""Microbench: fused LN->matmul Pallas kernel vs XLA composition on the TPU.

ViT-B/32 shapes @ b1024: x (51200, 768) bf16; fc1 (768, 3072); qkv (768, 2304).
Prints JSON rows; the 'auto' resolution in ops/fused_ln.py and PARITY.md's
perf section record the outcome. Run alone (one TPU process at a time).
"""

import json
import time

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

from concepthash_tpu.ops.fused_ln import ln_matmul


def fence(x):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0][:1]))


def time_it(fn, iters=20):
    fn()  # compile
    fence(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    fence(out)
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.default_rng(0)
    for (N, D, F, tag) in [(51200, 768, 3072, "fc1@b1024"),
                           (51200, 768, 2304, "qkv@b1024"),
                           (12800, 768, 3072, "fc1@b256"),
                           (13824, 768, 2304, "qkv@b256L54")]:
        x = jnp.asarray(rng.standard_normal((N, D)), jnp.bfloat16)
        gamma = jnp.asarray(rng.standard_normal(D), jnp.float32)
        beta = jnp.asarray(rng.standard_normal(D), jnp.float32)
        w = jnp.asarray(rng.standard_normal((D, F)) * 0.05, jnp.bfloat16)
        bias = jnp.zeros((F,), jnp.float32)

        run_x = jax.jit(lambda x, g, b, w, bb: ln_matmul(
            x, g, b, w, bb, impl="xla"))
        run_p = jax.jit(lambda x, g, b, w, bb: ln_matmul(
            x, g, b, w, bb, impl="pallas"))
        tx = time_it(lambda: run_x(x, gamma, beta, w, bias))
        tp = time_it(lambda: run_p(x, gamma, beta, w, bias))
        print(json.dumps({"shape": tag, "N": N, "D": D, "F": F,
                          "xla_us": round(tx * 1e6, 1),
                          "pallas_us": round(tp * 1e6, 1),
                          "speedup": round(tx / tp, 3)}))


if __name__ == "__main__":
    main()
