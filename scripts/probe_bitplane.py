#!/usr/bin/env python
"""Bit-plane mins kernel: real-TPU lowering + correctness + speed probe.

Stages (env SKIP list to drop): (1) small-N correctness — bitplane mins ==
packed-kernel mins and exact_topk_bitplane == exact_topk_minspass on the
same logical gallery; (2) 1e8 timing head-to-head vs the int8 packed path;
(3) optional N_DB override for bigger points.

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
                                             exact_topk_minspass,
                                             pack_bitplane_serving,
                                             pack_serving_gallery,
                                             subblock_min_dists_bitplane,
                                             subblock_min_dists_packed)


def fence(x):
    np.asarray(jax.device_get(jnp.ravel(x)[:1]))


def nblocks_for(total_rows: int, target: int = 2_000_000) -> int:
    """Smallest block count >= total/target that divides total exactly."""
    d = max(1, -(-total_rows // target))
    while total_rows % d:
        d += 1
    return d


def main():
    nbit, k = 64, 100
    rng = np.random.default_rng(7)

    # --- stage 1: correctness at 1e6 (vs the int8 packed kernel) ---
    N = 1_000_000
    db = np.where(rng.random((N, nbit)) < 0.5, 1, -1).astype(np.int8)
    q = jnp.asarray(np.where(rng.random((64, nbit)) < 0.5, 1.0, -1.0),
                    jnp.float32)
    packed, n_pad = pack_serving_gallery(jnp.asarray(db))
    bp, n_pad_b = pack_bitplane_serving(packed, nbit=nbit)
    assert n_pad == n_pad_b == N

    m_pk = jax.jit(lambda q, d: subblock_min_dists_packed(
        q, d, subblock=256, out_dtype=jnp.bfloat16))(q, packed)
    m_bp = jax.jit(lambda q, d: subblock_min_dists_bitplane(
        q, d, subblock=256, out_dtype=jnp.bfloat16))(q, bp)
    mp, mb = np.asarray(m_pk), np.asarray(m_bp)
    mins_ok = bool(np.array_equal(mp[: N // 256], mb[: N // 256]))

    d0, i0, v0 = jax.jit(lambda q, d: exact_topk_minspass(
        q, d, k=k, subblock=64))(q, packed)
    d1, i1, v1 = jax.jit(lambda q, d: exact_topk_bitplane(
        q, d, k=k, subblock=256))(q, bp)
    exact_ok = bool(np.array_equal(np.sort(np.asarray(d0), 1),
                                   np.sort(np.asarray(d1), 1)))
    print(json.dumps({"stage": "correctness_1m", "mins_equal": mins_ok,
                      "exact_equal": exact_ok,
                      "valid": [bool(v0), bool(v1)]}), flush=True)

    # --- stage 2: 1e8 head-to-head ---
    n_db = int(float(os.environ.get("N_DB", 100_000_000)))
    n_q = int(os.environ.get("N_Q", 256))
    subblock = int(os.environ.get("SUBBLOCK", 512))
    cap = int(os.environ.get("CAP", 0)) or None
    retry = int(os.environ.get("RETRY_MULT", 2))
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

    fn_bp = jax.jit(lambda q, d: exact_topk_bitplane(
        q, d, k=k, subblock=subblock, cap=cap, retry_mult=retry))
    t0 = time.perf_counter()
    d, i, v = fn_bp(qb, bp)
    fence(i)
    compile_s = time.perf_counter() - t0
    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        d, i, v = fn_bp(qb, bp)
    fence(i)
    dt = time.perf_counter() - t0
    print(json.dumps({"stage": f"bitplane_{n_db//1_000_000}m",
                      "qps": round(n_q * iters / dt, 1),
                      "valid": bool(jax.device_get(v)),
                      "subblock": subblock, "cap": cap, "retry": retry,
                      "compile_s": round(compile_s, 1)}), flush=True)
    del bp

    if os.environ.get("SKIP_INT8"):
        return
    # int8 packed comparison at the same N (64B/code: 6.4GB at 1e8)
    @jax.jit
    def gen_i8(keys):
        return jax.lax.map(
            lambda kk: ((jax.random.bits(kk, shp, dtype=jnp.uint8) & 1) * 2
                        - 1).astype(jnp.int8),
            keys).reshape(n_db * nbit // 128, 128)

    nblocks = nblocks_for(n_db * nbit // 128)
    shp = (n_db // nblocks * nbit // 128, 128)
    dbp = gen_i8(jax.random.split(jax.random.PRNGKey(0), nblocks))
    fence(dbp)
    from concepthash_tpu.ops.topk_select import pack_bits_serving
    bits = jax.jit(lambda d: pack_bits_serving(d, nbit))(dbp)
    fence(bits)
    fn_i8 = jax.jit(lambda q, d, b: exact_topk_minspass(
        q, d, k=k, subblock=64, db_bits=b))
    d, i, v = fn_i8(qb, dbp, bits)
    fence(i)
    t0 = time.perf_counter()
    for _ in range(iters):
        d, i, v = fn_i8(qb, dbp, bits)
    fence(i)
    dt = time.perf_counter() - t0
    print(json.dumps({"stage": f"int8_{n_db//1_000_000}m",
                      "qps": round(n_q * iters / dt, 1),
                      "valid": bool(jax.device_get(v))}), flush=True)


if __name__ == "__main__":
    main()
