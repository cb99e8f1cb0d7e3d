#!/usr/bin/env python
"""Tiling sweep for the stacked bit-plane mins kernel (mins-kernel-only).

With the i8_stack form the inner chunk drops to sim_budget/8 rows
(chunk_g=256 at P*Q=512) and the grid runs 8x more steps at block_g =
4*chunk_g. This sweeps block_g multiples and the sim-tile budget to check
whether grid-step overhead or dot length (M = 8*chunk_g) left anything on
the table. Run alone on the TPU; one JSON line per point.
"""

import itertools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import concepthash_tpu.ops.topk_select as ts


def fence(x):
    np.asarray(jax.device_get(jnp.ravel(x)[:1]))


def main():
    nbit = 64
    n_db = int(float(os.environ.get("N_DB", 100_000_000)))
    n_q = int(os.environ.get("N_Q", 256))
    subblock = int(os.environ.get("SUBBLOCK", 128))
    G = n_db * nbit // 128 // 8
    nblocks = max(1, -(-G // 2_000_000))
    while G % nblocks:
        nblocks += 1

    @jax.jit
    def gen_bp(keys):
        return jax.lax.map(
            lambda kk: jax.random.bits(kk, (G // nblocks, 128),
                                       dtype=jnp.uint8), keys).reshape(G, 128)

    bp = gen_bp(jax.random.split(jax.random.PRNGKey(0), nblocks))
    fence(bp)
    rng = np.random.default_rng(7)
    qb = jnp.asarray(np.where(rng.random((n_q, nbit)) < 0.5, 1.0, -1.0),
                     jnp.float32)

    gps = subblock // (128 // nbit) // 8
    iters = 3
    for budget_mb, bg_mult in itertools.product((4, 8), (4, 16, 64)):
        ts._SIM_TILE_BYTES = budget_mb << 20
        P = 128 // nbit
        budget_rows = ((ts._SIM_TILE_BYTES // 4 // (P * n_q) // 8)
                       // gps * gps)
        chunk_g = max(gps, min(2048, budget_rows))
        block_g = bg_mult * chunk_g
        try:
            fn = jax.jit(lambda q, d, bg=block_g: ts.subblock_min_dists_bitplane(
                q, d, subblock=subblock, block_g=bg,
                out_dtype=jnp.bfloat16, unpack="i8_stack"))
            t0 = time.perf_counter()
            m = fn(qb, bp)
            fence(m)
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            for _ in range(iters):
                m = fn(qb, bp)
            fence(m)
            dt = time.perf_counter() - t0
            del m
            print(json.dumps({"budget_mb": budget_mb, "block_g": block_g,
                              "chunk_g": chunk_g,
                              "s_per_call": round(dt / iters, 4),
                              "compile_s": round(compile_s, 1)}), flush=True)
        except Exception as e:  # record OOM/legalization points, keep going
            print(json.dumps({"budget_mb": budget_mb, "block_g": block_g,
                              "error": type(e).__name__,
                              "msg": str(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
