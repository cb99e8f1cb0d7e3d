#!/usr/bin/env python
"""Exact serving at 1e9 codes x 64 bits on ONE chip (VERDICT r4 task 5).

The int8 sign layout is 64 bytes/code — 64 GB at 1e9, 4x the v5e's 16 GB
HBM, so the round-4 serving engine walls at ~2e8 codes. The bit-plane
layout (ops/topk_select.pack_bitplane_serving) is 1 bit/bit = 8 bytes/code:
8 GB at 1e9, leaving room for the mins array (bf16, 1 GB at subblock 512)
and the selection workspace. The gallery is generated BORN in the bit-plane
layout (random bytes ARE random sign bits); exactness is spot-checked
on-device against a chunked dense unpack+MXU scan for a few queries.

Run alone on the TPU (one process at a time; see CLAUDE.md). Prints one
JSON line. Env knobs: N_DB (1e9), N_Q (256), SUBBLOCK (512), CAP (512),
SPOT_Q (4).
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
                                             unpack_bitplane)


def main():
    n_db = int(float(os.environ.get("N_DB", 1_000_000_000)))
    # Q=128 at 1e9: the (N/S, Q) bf16 mins + its one transpose are 2 GB
    # each at S=128 — beside the 8 GB gallery that is the 16 GB chip's
    # budget. Larger galleries-per-query amortize better but OOM.
    n_q = int(os.environ.get("N_Q", 128))
    nbit, k = 64, 100
    subblock = int(os.environ.get("SUBBLOCK", 128))
    cap = int(os.environ.get("CAP", 0)) or None   # None = auto (512)
    spot_q = int(os.environ.get("SPOT_Q", 4))

    # pad-free: whole byte rows (16 codes each at nbit=64) and whole
    # subblocks (1e9 is divisible by both at the S=128 default)
    assert n_db % 16 == 0 and n_db % subblock == 0, n_db
    G = n_db * nbit // 128 // 8             # bit-plane byte rows

    # born bit-plane: random bytes are random sign bits; block-wise so the
    # generator never materializes a second gallery-sized buffer. Block
    # count must DIVIDE G (smallest divisor with blocks <= ~2M rows).
    nblocks = max(1, -(-G // 2_000_000))
    while G % nblocks:
        nblocks += 1

    @jax.jit
    def gen(keys):
        return jax.lax.map(
            lambda kk: jax.random.bits(kk, (G // nblocks, 128),
                                       dtype=jnp.uint8),
            keys).reshape(G, 128)

    t0 = time.perf_counter()
    bp = gen(jax.random.split(jax.random.PRNGKey(0), nblocks))
    np.asarray(jax.device_get(bp[:1, :1]))  # fence (relay: block_until_ready
    gen_s = time.perf_counter() - t0        # returns early, CLAUDE.md)

    rng = np.random.default_rng(3)
    q = jnp.asarray(np.sign(rng.standard_normal((n_q, nbit))), jnp.float32)

    fn = jax.jit(lambda q, bp: exact_topk_bitplane(
        q, bp, k=k, subblock=subblock, cap=cap))
    t0 = time.perf_counter()
    d, i, v = fn(q, bp)
    np.asarray(jax.device_get(i[:1, :1]))
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    iters = int(os.environ.get("ITERS", 3))
    for _ in range(iters):
        d, i, v = fn(q, bp)
    host_i = np.asarray(jax.device_get(i))  # full fetch = fence
    dt = time.perf_counter() - t0
    host_d = np.asarray(jax.device_get(d))
    valid = bool(jax.device_get(v))

    # on-device exact spot check for spot_q queries: chunked dense unpack +
    # int8 MXU scan, per-chunk top-k merged by a final top-k — independent
    # of the mins/selection machinery under test
    nspot = max(1, -(-G // 262_144))        # ~4M codes per chunk
    while G % nspot:                         # chunk count must divide G
        nspot += 1
    gpc = G // nspot
    chunk_codes = gpc * 128 * 8 // nbit
    qs = q[:spot_q]
    qi = jnp.where(qs > 0, 1, -1).astype(jnp.int8)

    @jax.jit
    def spot(bp, qi):
        def blk(s):
            rows = jax.lax.dynamic_slice(bp, (s, 0), (gpc, 128))
            db = unpack_bitplane(rows).reshape(chunk_codes, nbit)
            sim = jax.lax.dot_general(
                qi, db, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)
            negd, li = jax.lax.top_k(sim, k)   # max sim == min dist
            base = (s * 8 * (128 // nbit)).astype(jnp.int32)
            return 0.5 * (nbit - negd).astype(jnp.float32), li + base

        starts = jnp.arange(G // gpc, dtype=jnp.int32) * gpc
        ds, ixs = jax.lax.map(blk, starts)      # (C, spot_q, k)
        dall = ds.transpose(1, 0, 2).reshape(spot_q, -1)
        iall = ixs.transpose(1, 0, 2).reshape(spot_q, -1)
        negd, sel = jax.lax.top_k(-dall, k)
        return -negd, jnp.take_along_axis(iall, sel, axis=1)

    sd, si = spot(bp, qi)
    sd = np.asarray(jax.device_get(sd))
    spot_ok = bool(np.array_equal(np.sort(host_d[:spot_q], 1),
                                  np.sort(sd, 1)))

    qps = n_q * iters / dt
    print(json.dumps({
        "metric": f"hamming64_exact_qps_{n_db // 1_000_000}m_bitplane",
        "value": round(qps, 1),
        "unit": "queries/s",
        "n_db": n_db, "n_q": n_q, "k": k,
        "subblock": subblock, "cap": cap,
        "gallery_bytes": n_db * nbit // 8,
        "pair_distances_per_s": round(qps * n_db, 1),
        "certificate_valid": valid,
        "spotcheck_exact_ok": spot_ok, "spot_q": spot_q,
        "gen_s": round(gen_s, 1), "compile_s": round(compile_s, 1),
        "iters": iters,
        "device": str(jax.devices()[0].device_kind),
    }))


if __name__ == "__main__":
    main()
