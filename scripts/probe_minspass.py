"""Stage accounting for the packed exact serving path (PACKED=1 N_DB=1e8)."""
import sys, time, os
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from concepthash_tpu.ops.topk_select import (exact_topk_minspass,
                                             subblock_min_dists_packed)
from concepthash_tpu.ops.retrieval import exact_topk_blocked

t00 = time.time()
def log(m): print(f"[{time.time()-t00:6.1f}s] {m}", flush=True)
def fence(x): np.asarray(x.ravel()[0])
def timeit(f, *a, iters=3):
    o = f(*a); fence(o[0] if isinstance(o, (tuple, list)) else o)
    t0 = time.perf_counter()
    for _ in range(iters): o = f(*a)
    fence(o[0] if isinstance(o, (tuple, list)) else o)
    return (time.perf_counter() - t0) / iters

N, Q, k = int(float(os.environ.get("N_DB", 1e8))), 256, 100
nbit = int(os.environ.get("NBIT", 64))   # 32/64/128 (packed layout widths)
nb = max(1, N // 2_000_000)
db = jax.jit(lambda: jax.lax.map(
    lambda kk: ((jax.random.bits(kk, (N // nb * nbit // 128, 128),
                                 dtype=jnp.uint8) & 1) * 2 - 1).astype(jnp.int8),
    jax.random.split(jax.random.PRNGKey(0), nb)).reshape(N * nbit // 128, 128))()
fence(db); log("db made (packed)")
q = jnp.sign(jax.random.normal(jax.random.PRNGKey(1), (Q, nbit))).astype(jnp.float32)

for br in (None, 16384, 32768):
    f = jax.jit(lambda q, db, br=br: subblock_min_dists_packed(
        q, db, block_rows2=br))
    t = timeit(f, q, db)
    log(f"kernel block_rows2={br}: {t*1e3:7.1f} ms")

m_real = N // 64
def sel_only(q, db):
    mt = subblock_min_dists_packed(q, db)
    return exact_topk_blocked(mt[:m_real].T, 1025, subblock=64, cap=2052)
t = timeit(jax.jit(sel_only), q, db)
log(f"kernel + inner sel(1025): {t*1e3:7.1f} ms")

from concepthash_tpu.ops.topk_select import pack_bits_serving  # noqa: E402

bits = jax.jit(lambda db: pack_bits_serving(db, nbit))(db)
fence(bits); log("bits packed (serving layout)")

f = jax.jit(lambda q, db, bits: exact_topk_minspass(q, db, k, db_bits=bits))
d, i, v = f(q, db, bits)
t = timeit(f, q, db, bits)
log(f"full minspass (precomputed bits): {t*1e3:7.1f} ms -> {Q/t:6.0f} qps "
    f"valid={bool(v)}")

f2 = jax.jit(lambda q, db: exact_topk_minspass(q, db, k))
d2, i2, v2 = f2(q, db)
t2 = timeit(f2, q, db)
log(f"full minspass (bits derived in-call): {t2*1e3:7.1f} ms -> "
    f"{Q/t2:6.0f} qps valid={bool(v2)}")
assert np.array_equal(np.asarray(d), np.asarray(d2))
