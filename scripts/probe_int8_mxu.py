"""Does Mosaic/XLA hit the v5e int8 MXU double-rate (394 TOPS) or the bf16
rate (197 TFLOP/s)? Decides whether the fused mins kernel (ops/topk_select)
has ~2x compute headroom at its measured 38.5ms/1e8 point, whose block-
diagonal contraction floor is 33ms at bf16 rate but 16.6ms at int8 rate.

Measures (a) plain XLA dot_general at the kernel's shapes for int8 vs bf16,
(b) the pallas kernel's own dot in isolation (grid over blocks, no min
reduction), (c) the kernel as shipped. Fetch-fenced (relay lies about
block_until_ready, CLAUDE.md).
"""
import sys, time, os
sys.path.insert(0, "/root/repo")
import functools
import numpy as np, jax, jax.numpy as jnp

t00 = time.time()
def log(m): print(f"[{time.time()-t00:6.1f}s] {m}", flush=True)
def fence(x): np.asarray(x.ravel()[0])
def timeit(f, *a, iters=5):
    o = f(*a); fence(o)
    t0 = time.perf_counter()
    for _ in range(iters): o = f(*a)
    fence(o)
    return (time.perf_counter() - t0) / iters

# --- (a) big plain dots: M x K=128 x N, int8 vs bf16 ---
M, K = 1 << 20, 128
for N in (256, 512):
    a8 = jnp.ones((M, K), jnp.int8)
    b8 = jnp.ones((N, K), jnp.int8)
    f8 = jax.jit(lambda a, b: jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32))
    t8 = timeit(f8, a8, b8)
    ops = 2 * M * K * N
    log(f"xla int8  dot {M}x{K}x{N}: {t8*1e3:6.2f} ms = {ops/t8/1e12:6.1f} Tops")
    abf = jnp.ones((M, K), jnp.bfloat16)
    bbf = jnp.ones((N, K), jnp.bfloat16)
    fbf = jax.jit(lambda a, b: jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32))
    tbf = timeit(fbf, abf, bbf)
    log(f"xla bf16  dot {M}x{K}x{N}: {tbf*1e3:6.2f} ms = {ops/tbf/1e12:6.1f} Tops")

# --- (b) pallas dot-only kernel at the mins kernel's shapes ---
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def dot_kernel(q_ref, db_ref, o_ref, *, chunk2, block_rows2, NQ):
    acc = jnp.zeros((chunk2, NQ), jnp.int32)
    for c in range(block_rows2 // chunk2):
        acc += jax.lax.dot_general(
            db_ref[c * chunk2:(c + 1) * chunk2, :], q_ref[...],
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32)
    o_ref[...] = acc  # tiny write: keeps the loop live, no min reduce

Np = 50_000_000  # 1e8 codes at nbit=64 packed
NQ = 512
for block_rows2, chunk2 in ((8192, 2048), (8192, 4096), (16384, 2048),
                            (16384, 8192), (32768, 8192)):
    db = jnp.ones((Np, 128), jnp.int8)
    qc = jnp.ones((NQ, 128), jnp.int8)
    grid = Np // block_rows2
    f = jax.jit(lambda qc, db, br=block_rows2, c2=chunk2, g=grid: pl.pallas_call(
        functools.partial(dot_kernel, chunk2=c2, block_rows2=br, NQ=NQ),
        grid=(g,),
        in_specs=[pl.BlockSpec((NQ, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((br, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((c2, NQ), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((chunk2, NQ), jnp.int32),
    )(qc, db))
    try:
        t = timeit(f, qc, db, iters=3)
        ops = 2 * Np * 128 * NQ
        log(f"pallas dot-only br={block_rows2} c2={chunk2}: {t*1e3:6.1f} ms "
            f"= {ops/t/1e12:6.1f} Tops")
    except Exception as e:
        log(f"pallas dot-only br={block_rows2} c2={chunk2}: FAILED {e}")

# --- (c) the shipped kernel for reference ---
from concepthash_tpu.ops.topk_select import subblock_min_dists_packed
q = jnp.sign(jax.random.normal(jax.random.PRNGKey(1), (256, 64))).astype(jnp.float32)
db = ((jax.random.bits(jax.random.PRNGKey(0), (Np, 128), dtype=jnp.uint8) & 1)
      * 2 - 1).astype(jnp.int8)
for br in (None, 16384, 32768):
    f = jax.jit(lambda q, db, br=br: subblock_min_dists_packed(
        q, db, block_rows2=br))
    t = timeit(f, q, db, iters=3)
    ops = 2 * Np * 128 * 512
    log(f"shipped kernel br={br}: {t*1e3:6.1f} ms = {ops/t/1e12:6.1f} Tops")
