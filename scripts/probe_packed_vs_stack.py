import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

from concepthash_tpu.ops.topk_select import (subblock_min_dists_packed,
                                             subblock_min_dists_bitplane)


def fence(x):
    np.asarray(jax.device_get(jnp.ravel(x)[:1]))


nbit, n_db, n_q = 64, 100_000_000, 256
rng = np.random.default_rng(7)
qb = jnp.asarray(np.where(rng.random((n_q, nbit)) < 0.5, 1.0, -1.0),
                 jnp.float32)

# packed int8 gallery (6.4 GB)
rows = n_db * nbit // 128
nblocks = max(1, -(-rows // 2_000_000))
while rows % nblocks:
    nblocks += 1
shp = (rows // nblocks, 128)


@jax.jit
def gen_i8(keys):
    return jax.lax.map(
        lambda kk: ((jax.random.bits(kk, shp, dtype=jnp.uint8) & 1) * 2 - 1
                    ).astype(jnp.int8), keys).reshape(rows, 128)


dbp = gen_i8(jax.random.split(jax.random.PRNGKey(0), nblocks))
fence(dbp)

iters = 3
fn_pk = jax.jit(lambda q, d: subblock_min_dists_packed(
    q, d, subblock=64, out_dtype=jnp.bfloat16))
t0 = time.perf_counter(); m = fn_pk(qb, dbp); fence(m)
compile_s = time.perf_counter() - t0
t0 = time.perf_counter()
for _ in range(iters):
    m = fn_pk(qb, dbp)
fence(m)
dt = time.perf_counter() - t0
del m
macs = n_db * n_q * nbit * 2  # ops (2/MAC), per call
print(json.dumps({"kernel": "packed_int8", "s_per_call": round(dt / iters, 4),
                  "ops_tops": round(macs / (dt / iters) / 1e12, 1),
                  "compile_s": round(compile_s, 1)}), flush=True)
del dbp

# bit-plane gallery (0.8 GB)
G = n_db * nbit // 128 // 8
nblocks = max(1, -(-G // 2_000_000))
while G % nblocks:
    nblocks += 1


@jax.jit
def gen_bp(keys):
    return jax.lax.map(
        lambda kk: jax.random.bits(kk, (G // nblocks, 128), dtype=jnp.uint8),
        keys).reshape(G, 128)


bp = gen_bp(jax.random.split(jax.random.PRNGKey(1), nblocks))
fence(bp)
fn_bp = jax.jit(lambda q, d: subblock_min_dists_bitplane(
    q, d, subblock=128, out_dtype=jnp.bfloat16))
t0 = time.perf_counter(); m = fn_bp(qb, bp); fence(m)
compile_s = time.perf_counter() - t0
t0 = time.perf_counter()
for _ in range(iters):
    m = fn_bp(qb, bp)
fence(m)
dt = time.perf_counter() - t0
print(json.dumps({"kernel": "bitplane_stack", "s_per_call": round(dt / iters, 4),
                  "ops_tops": round(macs / (dt / iters) / 1e12, 1),
                  "compile_s": round(compile_s, 1)}), flush=True)
