"""Where do 3.27s go when exact_topk_minspass derives db_bits in-call at 1e8?
(probe_minspass v5: precomputed bits 52.3ms, derived in-call 3271ms.)

Stages timed separately on the packed 1e8x64 gallery:
  A. pack_bits_serving as shipped (lax.map of dynamic_slice + pack_bits)
  B. pack_bits alone on one 4.19M-code chunk (isolate the shift-reduce)
  C. MXU variant: bits @ pow2 split into two 16-bit halves (f32-exact),
     combined hi<<16|lo — candidate replacement if A is compute-bound.
All jitted, fenced with a host fetch (bench.time_it semantics).
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

from bench import time_it
from concepthash_tpu.ops.topk_select import pack_bits_serving, _PACK_CHUNK_CODES
from concepthash_tpu.ops.hamming import pack_bits

N = int(float(os.environ.get("N_DB", "1e8")))
nbit = 64
t0 = time.time()

# gallery born packed, chunked generation (probe_minspass recipe)
nblocks = max(1, N // 2_000_000)
shp = (N // nblocks * nbit // 128, 128)
@jax.jit
def gen(keys):
    return jax.lax.map(
        lambda k: ((jax.random.bits(k, shp, dtype=jnp.uint8) & 1) * 2 - 1
                   ).astype(jnp.int8), keys)
db = gen(jax.random.split(jax.random.PRNGKey(0), nblocks)).reshape(-1, 128)
db.block_until_ready()
print(f"[{time.time()-t0:6.1f}s] db ready ({db.nbytes/1e9:.1f}GB packed)", flush=True)

f_ship = jax.jit(lambda d: pack_bits_serving(d, nbit))
s = time_it(lambda: f_ship(db), warmup=1, iters=3)
print(f"[{time.time()-t0:6.1f}s] A shipped pack_bits_serving: {s*1000:8.1f} ms", flush=True)

chunk = db[: _PACK_CHUNK_CODES * nbit // 128]
f_one = jax.jit(lambda d: pack_bits(d.reshape(-1, nbit)))
s1 = time_it(lambda: f_one(chunk), warmup=1, iters=5)
nchunks = N // _PACK_CHUNK_CODES
print(f"[{time.time()-t0:6.1f}s] B pack_bits 1 chunk ({_PACK_CHUNK_CODES} codes): "
      f"{s1*1000:8.1f} ms  (x{nchunks} = {s1*nchunks*1000:.0f} ms)", flush=True)

# C: MXU pack — (M,64) signs -> two f32 dots with 2^0..2^15 per 32-bit word half
P16 = np.zeros((nbit, (nbit // 32) * 2), np.float32)
for w in range(nbit // 32):
    for h in range(2):
        for b in range(16):
            P16[w * 32 + h * 16 + b, w * 2 + h] = float(1 << b)
P16 = jnp.asarray(P16)

def pack_mxu(d):
    bits = (d.reshape(-1, nbit) > 0).astype(jnp.bfloat16)  # try bf16 MXU
    # bf16 mantissa can't hold 16-bit sums exactly -> use f32 input instead
    bitsf = bits.astype(jnp.float32)
    halves = jax.lax.dot_general(bitsf, P16, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    h = halves.astype(jnp.uint32).reshape(-1, nbit // 32, 2)
    return (h[..., 0] | (h[..., 1] << 16)).astype(jnp.uint32)

f_mxu = jax.jit(pack_mxu)
a = np.asarray(f_mxu(chunk))
b = np.asarray(f_one(chunk))
assert np.array_equal(a, b), "MXU pack mismatch"
s2 = time_it(lambda: f_mxu(chunk), warmup=1, iters=5)
print(f"[{time.time()-t0:6.1f}s] C MXU pack 1 chunk: {s2*1000:8.1f} ms  "
      f"(x{nchunks} = {s2*nchunks*1000:.0f} ms)", flush=True)

# D: no-reshape MXU pack straight off the (M, 128) packed layout — the
# reshape(-1, nbit) in B/C is the 2x lane-pad relayout copy; skip it.
lanes = 128
P = lanes // nbit
L = nbit // 32
W = np.zeros((lanes, P * L * 2), np.float32)
for p in range(P):
    for w in range(L):
        for h in range(2):
            for b in range(16):
                W[p * nbit + w * 32 + h * 16 + b, p * (L * 2) + w * 2 + h] = float(1 << b)
Wb = jnp.asarray(W, jnp.bfloat16)

S = 64
def pack_mxu_packed(d):                       # (M, 128) int8 -> serving rows
    bits = (d > 0).astype(jnp.bfloat16)
    halves = jax.lax.dot_general(bits, Wb, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    h = halves.astype(jnp.uint32).reshape(-1, P * L, 2)
    words = h[..., 0] | (h[..., 1] << 16)     # (M, P*L) code-major words
    return words.reshape(-1, S * L)           # 512B serving rows

f_mxup = jax.jit(pack_mxu_packed)
a = np.asarray(f_mxup(chunk)).reshape(-1, L)
b2 = np.asarray(f_one(chunk)).reshape(-1, L)
assert np.array_equal(a, b2), "packed MXU pack mismatch"
s3 = time_it(lambda: f_mxup(chunk), warmup=1, iters=5)
print(f"[{time.time()-t0:6.1f}s] D MXU pack, no reshape, 1 chunk: {s3*1000:8.1f} ms  "
      f"(x{nchunks} = {s3*nchunks*1000:.0f} ms)", flush=True)

# E: and the shift-reduce form straight off the packed layout (isolates
# whether B's cost was the relayout or the shift-reduce itself)
def pack_shift_packed(d):
    bits = (d > 0).astype(jnp.uint32).reshape(-1, 4, 32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    words = (bits << shifts).sum(-1).astype(jnp.uint32)   # (M, 4)
    return words.reshape(-1, S * L)

f_shp = jax.jit(pack_shift_packed)
a = np.asarray(f_shp(chunk)).reshape(-1, L)
assert np.array_equal(a, b2), "packed shift pack mismatch"
s4 = time_it(lambda: f_shp(chunk), warmup=1, iters=5)
print(f"[{time.time()-t0:6.1f}s] E shift pack, no reshape, 1 chunk: {s4*1000:8.1f} ms  "
      f"(x{nchunks} = {s4*nchunks*1000:.0f} ms)", flush=True)
