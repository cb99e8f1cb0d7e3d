#!/usr/bin/env python
"""Serving-scale retrieval: 100M-entry 64-bit gallery on ONE chip.

Gallery stored as int8 signs (6.4GB HBM at 1e8 x 64 bits); distances come
from int8 MXU matmuls over db blocks with a running top-k merge
(ops.retrieval.retrieve_topk_streaming) so the (Q, N) distance matrix never
materializes. The packed-popcount path measures ~5e9 pair-distances/s
(VPU-bound); the int8 MXU path is the serving engine. Prints one JSON line.

Run alone on the TPU (one process at a time; see CLAUDE.md).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from concepthash_tpu.ops.retrieval import retrieve_topk_streaming


def main():
    n_db = int(float(os.environ.get("N_DB", 100_000_000)))
    n_q = int(os.environ.get("N_Q", 256))
    nbit, k = 64, 100
    db_block = int(float(os.environ.get("DB_BLOCK", 2_000_000)))

    nblocks = n_db // db_block
    packed = bool(os.environ.get("PACKED"))
    # PACKED: generate the gallery BORN in the 128-lane serving layout —
    # reshaping an existing (N, nbit<128) device array relayout-copies it
    # with 128/nbit lane padding (2x HBM at nbit=64: OOM at 1e8)
    blk_shape = ((db_block * nbit // 128, 128) if packed
                 else (db_block, nbit))

    @jax.jit
    def gen_db(keys):  # ±1 int8 random signs, written block-wise in place
        def blk(key):
            bits = jax.random.bits(key, blk_shape, dtype=jnp.uint8)
            return ((bits & 1) * 2 - 1).astype(jnp.int8)

        return jax.lax.map(blk, keys).reshape(
            (n_db * nbit // 128, 128) if packed else (n_db, nbit))

    db = gen_db(jax.random.split(jax.random.PRNGKey(0), nblocks))
    db.block_until_ready()
    q = np.sign(np.random.default_rng(1).standard_normal((n_q, nbit))
                ).astype(np.float32)
    q = jnp.asarray(q)

    exact = bool(os.environ.get("EXACT"))
    fn = jax.jit(lambda q, db: retrieve_topk_streaming(q, db, k=k,
                                                       db_block=db_block,
                                                       exact=exact))

    def run():
        return fn(q, db)

    d, idx = run()  # compile
    np.asarray(jax.device_get(idx[:1, :1]))  # fence
    t0 = time.perf_counter()
    iters = 3
    for _ in range(iters):
        d, idx = run()
    np.asarray(jax.device_get(idx[:1, :1]))
    sec = (time.perf_counter() - t0) / iters
    qps = n_q / sec
    out = {
        "metric": f"hamming64_retrieval_qps_{n_db // 1_000_000}m_gallery",
        "value": round(qps, 1), "unit": "queries/s",
        "gallery_bytes": n_db * nbit,  # int8 sign layout
        "pair_distances_per_s": round(qps * n_db, 1),
        "backend": jax.default_backend(), "exact": exact, "packed": packed}

    if os.environ.get("MEASURE_RECALL"):
        # host-exact top-k for a query subset: does per-block approx_min_k
        # (recall_target 0.95) compound across the merge? Distance-level
        # recall: a streamed hit counts if its distance is <= the exact k-th
        # (Hamming ties make index-level recall ill-posed).
        nq_r = int(os.environ.get("RECALL_QUERIES", 16))
        db_h = np.asarray(jax.device_get(db)).reshape(n_db, nbit)  # int8
        q_h = np.asarray(jax.device_get(q[:nq_r]))
        # float32 matmul hits BLAS (int matmul is numpy's slow path); ±1
        # signs times nbit<=2^23 stay exact in f32
        sim = db_h.astype(np.float32) @ q_h.T.astype(np.float32)  # (N, nq)
        dist_exact = 0.5 * (nbit - sim.T)  # (nq, N)
        kth = np.partition(dist_exact, k - 1, axis=1)[:, k - 1]
        d_s = np.asarray(jax.device_get(d[:nq_r]))
        out["recall_at_k"] = round(
            float((d_s <= kth[:, None]).mean()), 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
