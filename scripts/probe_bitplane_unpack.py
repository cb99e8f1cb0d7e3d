#!/usr/bin/env python
"""A/B the bit-plane mins kernel's plane-extraction form on the real TPU.

The shipped kernel ("i32_shift") promotes each byte tile to i32 because
Mosaic only legalizes vector shifts at 32 bits — a 4x-wide tile copy per
chunk. "i8_mask" extracts plane j as ``(byte & (1 << j)) != 0`` on the
stored uint8 tile (and + compare DO legalize on vector<i8>), skipping the
promotion. Stages: (1) correctness at 1e6 — both unpacks produce identical
mins and identical exact top-k; (2) mins-kernel-only timing at N_DB;
(3) end-to-end exact_topk_bitplane qps, both variants.

Run alone on the TPU. Prints one JSON line per stage.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from concepthash_tpu.ops.topk_select import (exact_topk_bitplane,
                                             pack_bitplane_serving,
                                             pack_serving_gallery,
                                             subblock_min_dists_bitplane)


def fence(x):
    np.asarray(jax.device_get(jnp.ravel(x)[:1]))


def nblocks_for(total_rows: int, target: int = 2_000_000) -> int:
    d = max(1, -(-total_rows // target))
    while total_rows % d:
        d += 1
    return d


def main():
    nbit, k = 64, 100
    rng = np.random.default_rng(7)

    # --- stage 1: correctness at 1e6 (i8_mask == i32_shift) ---
    N = 1_000_000
    db = np.where(rng.random((N, nbit)) < 0.5, 1, -1).astype(np.int8)
    q = jnp.asarray(np.where(rng.random((64, nbit)) < 0.5, 1.0, -1.0),
                    jnp.float32)
    packed, n_pad = pack_serving_gallery(jnp.asarray(db))
    bp, _ = pack_bitplane_serving(packed, nbit=nbit)

    variants = os.environ.get("VARIANTS", "i32_shift,i8_mask").split(",")
    outs = {}
    for u in ("i32_shift",) + tuple(v for v in variants if v != "i32_shift"):
        m = jax.jit(lambda q, d, u=u: subblock_min_dists_bitplane(
            q, d, subblock=256, out_dtype=jnp.bfloat16, unpack=u))(q, bp)
        d1, i1, v1 = jax.jit(lambda q, d, u=u: exact_topk_bitplane(
            q, d, k=k, subblock=256, unpack=u))(q, bp)
        outs[u] = (np.asarray(m), np.asarray(d1), np.asarray(i1), bool(v1))
    ref = outs["i32_shift"]
    mins_ok = all(np.array_equal(ref[0], o[0]) for o in outs.values())
    topk_ok = all(np.array_equal(ref[1], o[1])
                  and np.array_equal(ref[2], o[2]) for o in outs.values())
    print(json.dumps({"stage": "correctness_1m", "mins_equal": mins_ok,
                      "topk_equal": topk_ok,
                      "valid": [o[3] for o in outs.values()]}),
          flush=True)
    if not (mins_ok and topk_ok):
        return

    # --- stages 2+3: timing at N_DB ---
    n_db = int(float(os.environ.get("N_DB", 100_000_000)))
    n_q = int(os.environ.get("N_Q", 256))
    subblock = int(os.environ.get("SUBBLOCK", 128))
    G = n_db * nbit // 128 // 8
    nblocks = nblocks_for(G)

    @jax.jit
    def gen_bp(keys):
        return jax.lax.map(
            lambda kk: jax.random.bits(kk, (G // nblocks, 128),
                                       dtype=jnp.uint8), keys).reshape(G, 128)

    bp = gen_bp(jax.random.split(jax.random.PRNGKey(0), nblocks))
    fence(bp)
    qb = jnp.asarray(np.where(rng.random((n_q, nbit)) < 0.5, 1.0, -1.0),
                     jnp.float32)

    iters = 3
    for u in variants:
        fn_m = jax.jit(lambda q, d, u=u: subblock_min_dists_bitplane(
            q, d, subblock=subblock, out_dtype=jnp.bfloat16, unpack=u))
        t0 = time.perf_counter()
        m = fn_m(qb, bp)
        fence(m)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(iters):
            m = fn_m(qb, bp)
        fence(m)
        dt = time.perf_counter() - t0
        del m
        print(json.dumps({"stage": f"mins_{n_db//1_000_000}m", "unpack": u,
                          "s_per_call": round(dt / iters, 3),
                          "qps": round(n_q * iters / dt, 1),
                          "compile_s": round(compile_s, 1)}), flush=True)

        fn_e = jax.jit(lambda q, d, u=u: exact_topk_bitplane(
            q, d, k=k, subblock=subblock, unpack=u))
        d1, i1, v1 = fn_e(qb, bp)
        fence(i1)
        t0 = time.perf_counter()
        for _ in range(iters):
            d1, i1, v1 = fn_e(qb, bp)
        fence(i1)
        dt = time.perf_counter() - t0
        print(json.dumps({"stage": f"exact_{n_db//1_000_000}m", "unpack": u,
                          "qps": round(n_q * iters / dt, 1),
                          "valid": bool(jax.device_get(v1))}), flush=True)


if __name__ == "__main__":
    main()
