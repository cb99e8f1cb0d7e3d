"""Tuning variants for the fused mins kernel (ops/topk_select.py).

probe_int8_mxu established: int8 dot-only at the kernel's shapes runs at
227 Tops (the v5e int8 double-rate path IS engaged; bf16 peak is 197), while
the shipped kernel measures ~170 Tops — the ~10ms gap is VPU work. Variants:

  A  shipped kernel (baseline)
  B  tail mask hoisted out (gallery assumed padded to a block multiple;
     pad rows handled by zero-fill -> dist nbit/2, certificate-safe)
  C  B + bf16 mins output (half-integers <=128 are EXACT in bf16; halves
     the mins write and every downstream pass over the mins)
  D  C + chunk2/block_rows2 sweep with raised scoped-VMEM limit
  E  int4 dot feasibility (v5e int4 peak 794 Tops)

Fetch-fenced (the relay lies about block_until_ready, CLAUDE.md).
"""
import sys, time, functools
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

t00 = time.time()
def log(m): print(f"[{time.time()-t00:6.1f}s] {m}", flush=True)
def fence(x): np.asarray(x.ravel()[0])
def timeit(f, *a, iters=3):
    o = f(*a); fence(o)
    t0 = time.perf_counter()
    for _ in range(iters): o = f(*a)
    fence(o)
    return (time.perf_counter() - t0) / iters

Np, Q, nbit, P = 50_000_000, 256, 64, 2
NQ = P * Q
subblock = 64
spp = subblock // P
OPS = 2 * Np * 128 * NQ

nb = 25  # chunked generation: one-shot random.bits materializes 4x uint32
db = jax.jit(lambda: jax.lax.map(
    lambda k: ((jax.random.bits(k, (Np // nb, 128), dtype=jnp.uint8) & 1)
               * 2 - 1).astype(jnp.int8),
    jax.random.split(jax.random.PRNGKey(0), nb)).reshape(Np, 128))()
fence(db); log("db ready (6.4GB packed)")
q = jnp.sign(jax.random.normal(jax.random.PRNGKey(1), (Q, nbit))).astype(jnp.float32)

from concepthash_tpu.ops.topk_select import (_block_diag_queries,
                                             subblock_min_dists_packed)

qi = jnp.sign(q).astype(jnp.int8)
qc = _block_diag_queries(qi, P)

# --- A: shipped ---
fA = jax.jit(lambda q, db: subblock_min_dists_packed(q, db))
tA = timeit(fA, q, db)
log(f"A shipped:                      {tA*1e3:6.1f} ms = {OPS/tA/1e12:5.1f} Tops")
ref_out = np.asarray(fA(q, db))

def variant_kernel(qc_ref, db_ref, o_ref, *, block_rows2, chunk2, out_dtype,
                   mask_rows=None):
    """Mask-free (or last-block-only masked) packed mins kernel."""
    for c in range(block_rows2 // chunk2):
        sim2 = jax.lax.dot_general(
            db_ref[c * chunk2:(c + 1) * chunk2, :], qc_ref[...],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)              # (chunk2, P*Q)
        g = sim2.reshape(chunk2 // spp, spp, sim2.shape[1])
        gmax = jnp.max(g, axis=1)
        m = gmax[:, 0:Q]
        for p in range(1, P):
            m = jnp.maximum(m, gmax[:, p * Q:(p + 1) * Q])
        nblk = chunk2 // spp
        o_ref[c * nblk:(c + 1) * nblk, :] = (
            0.5 * (nbit - m).astype(jnp.float32)).astype(out_dtype)

def run_variant(block_rows2, chunk2, out_dtype, vmem_mb=None):
    # pad gallery handled OUTSIDE (born-padded here: Np % block_rows2 rows
    # would be zero-filled by the caller at pack time)
    grid = Np // block_rows2          # Np=5e7 divisible for tested sizes? no
    Np_pad = grid * block_rows2       # measure on the truncated gallery:
    #                                   same arithmetic intensity
    kw = {}
    if vmem_mb:
        kw["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb * 1024 * 1024)
    f = pl.pallas_call(
        functools.partial(variant_kernel, block_rows2=block_rows2,
                          chunk2=chunk2, out_dtype=out_dtype),
        grid=(grid,),
        in_specs=[pl.BlockSpec((NQ, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((block_rows2, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((block_rows2 // spp, Q), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Np_pad // spp, Q), out_dtype),
        **kw,
    )
    return jax.jit(lambda qc, d: f(qc, d[:Np_pad]))

for (br, c2, dt, vm) in [
    (8192, 2048, jnp.float32, None),     # B: mask-free, shipped geometry
    (8192, 2048, jnp.bfloat16, None),    # C: + bf16 out
    (8192, 4096, jnp.bfloat16, 64),      # D sweep
    (16384, 4096, jnp.bfloat16, 64),
    (16384, 8192, jnp.bfloat16, 100),
    (32768, 4096, jnp.bfloat16, 64),
    (8192, 8192, jnp.bfloat16, 100),
    (16384, 2048, jnp.bfloat16, None),
]:
    try:
        f = run_variant(br, c2, dt, vm)
        t = timeit(f, qc, db)
        name = f"br={br} c2={c2} {jnp.dtype(dt).name} vm={vm}"
        ops = 2 * (Np // br * br) * 128 * NQ
        log(f"variant {name:42s} {t*1e3:6.1f} ms = {ops/t/1e12:5.1f} Tops")
        # spot-correctness vs shipped on the overlapping prefix
        out = np.asarray(f(qc, db)).astype(np.float32)
        nrow = min(out.shape[0], ref_out.shape[0], 4096)
        if not np.array_equal(out[:nrow], ref_out[:nrow]):
            log(f"  !! MISMATCH vs shipped on first {nrow} rows")
    except Exception as e:
        log(f"variant br={br} c2={c2} {jnp.dtype(dt).name} vm={vm}: "
            f"FAILED {str(e)[:160]}")

# --- E: int4 feasibility (small) ---
try:
    a4 = jnp.ones((1 << 16, 128), jnp.int4)
    b4 = jnp.ones((512, 128), jnp.int4)
    f4 = jax.jit(lambda a, b: jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32))
    t4 = timeit(f4, a4, b4, iters=5)
    ops4 = 2 * (1 << 16) * 128 * 512
    log(f"E xla int4 dot 65536x128x512:   {t4*1e3:6.2f} ms = {ops4/t4/1e12:5.1f} Tops")
except Exception as e:
    log(f"E int4 XLA: FAILED {str(e)[:200]}")

def int4_kernel(qc_ref, db_ref, o_ref, *, block_rows2, chunk2):
    for c in range(block_rows2 // chunk2):
        sim2 = jax.lax.dot_general(
            db_ref[c * chunk2:(c + 1) * chunk2, :], qc_ref[...],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)
        g = sim2.reshape(chunk2 // spp, spp, sim2.shape[1])
        gmax = jnp.max(g, axis=1)
        m = gmax[:, 0:Q]
        for p in range(1, P):
            m = jnp.maximum(m, gmax[:, p * Q:(p + 1) * Q])
        nblk = chunk2 // spp
        o_ref[c * nblk:(c + 1) * nblk, :] = (
            0.5 * (nbit - m).astype(jnp.float32)).astype(jnp.bfloat16)

try:
    br, c2 = 16384, 4096
    grid = Np // br
    Np_pad = grid * br
    db4 = db.astype(jnp.int4)
    qc4 = qc.astype(jnp.int4)
    fence(jnp.asarray(db4[:8]).astype(jnp.int8))
    f = pl.pallas_call(
        functools.partial(int4_kernel, block_rows2=br, chunk2=c2),
        grid=(grid,),
        in_specs=[pl.BlockSpec((NQ, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((br, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((br // spp, Q), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Np_pad // spp, Q), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )
    g = jax.jit(lambda qc, d: f(qc, d[:Np_pad]))
    t = timeit(g, qc4, db4)
    ops = 2 * Np_pad * 128 * NQ
    log(f"E pallas int4 mins kernel:      {t*1e3:6.1f} ms = {ops/t/1e12:5.1f} Tops")
    out = np.asarray(g(qc4, db4)).astype(np.float32)
    nrow = min(out.shape[0], ref_out.shape[0], 4096)
    log(f"  int4 matches shipped on first {nrow} rows: "
        f"{np.array_equal(out[:nrow], ref_out[:nrow])}")
except Exception as e:
    log(f"E int4 pallas: FAILED {str(e)[:200]}")
