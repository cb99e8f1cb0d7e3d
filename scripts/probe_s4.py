"""Sub-stage accounting for the rescore stage (s4 = 62.9ms of the 141.9ms
exact 100M call, probe_stage4) + cap=512 certificate check under the new
no-fallback inner selection. PACKED, N_DB=1e8 default."""
import sys, time, os
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from concepthash_tpu.ops.topk_select import (exact_topk_minspass,
                                             subblock_min_dists_packed,
                                             _approx_smallest_rows, _cdiv)

t00 = time.time()
def log(m): print(f"[{time.time()-t00:6.1f}s] {m}", flush=True)
def fence(x):
    while isinstance(x, (tuple, list)): x = x[0]
    np.asarray(x.ravel()[0])
def timeit(f, *a, iters=3):
    o = f(*a); fence(o)
    t0 = time.perf_counter()
    for _ in range(iters): o = f(*a)
    fence(o)
    return (time.perf_counter() - t0) / iters

N, Q, nbit, k = int(float(os.environ.get("N_DB", 1e8))), 256, 64, 100
cap, sub = 1024, 64
nb = max(1, N // 2_000_000)
db = jax.jit(lambda: jax.lax.map(
    lambda kk: ((jax.random.bits(kk, (N // nb * nbit // 128, 128),
                                 dtype=jnp.uint8) & 1) * 2 - 1).astype(jnp.int8),
    jax.random.split(jax.random.PRNGKey(0), nb)).reshape(N * nbit // 128, 128))()
fence(db); log(f"db made (packed, N={N:.0e})")
q = jnp.sign(jax.random.normal(jax.random.PRNGKey(1), (Q, nbit))).astype(jnp.float32)
qi = jnp.sign(q).astype(jnp.int8)
m_real = _cdiv(N, sub)

mt = jax.jit(lambda q, db: subblock_min_dists_packed(q, db))(q, db)
sel, theta = jax.jit(lambda mt: _approx_smallest_rows(
    mt[:m_real].T, cap, return_theta=True))(mt)
fence(sel); log("sel ready")

db_sb = db.reshape(-1, sub * nbit)

def g_only(sel, db_sb):
    return jnp.take(db_sb, jnp.minimum(sel, db_sb.shape[0] - 1).reshape(-1),
                    axis=0)
t = timeit(jax.jit(g_only), sel, db_sb)
log(f"s4a gather only (1.07GB):   {t*1e3:7.1f} ms")

def g_dot(sel, db_sb):
    cand = jnp.take(db_sb, jnp.minimum(sel, db_sb.shape[0] - 1).reshape(-1),
                    axis=0).reshape(Q, cap, sub, nbit)
    return jax.lax.dot_general(
        cand, qi, dimension_numbers=(((3,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32)
t = timeit(jax.jit(g_dot), sel, db_sb)
log(f"s4b +rescore dot:           {t*1e3:7.1f} ms")

def g_dot_top(sel, db_sb):
    cand = jnp.take(db_sb, jnp.minimum(sel, db_sb.shape[0] - 1).reshape(-1),
                    axis=0).reshape(Q, cap, sub, nbit)
    sim_c = jax.lax.dot_general(
        cand, qi, dimension_numbers=(((3,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32)
    dist_c = 0.5 * (nbit - sim_c).astype(jnp.float32).reshape(Q, cap * sub)
    return jax.lax.top_k(-dist_c, k)
t = timeit(jax.jit(g_dot_top), sel, db_sb)
log(f"s4c +final top_k:           {t*1e3:7.1f} ms")

# int32-keyed top_k (distances are integers; skip the f32 convert)
def g_dot_top_i32(sel, db_sb):
    cand = jnp.take(db_sb, jnp.minimum(sel, db_sb.shape[0] - 1).reshape(-1),
                    axis=0).reshape(Q, cap, sub, nbit)
    sim_c = jax.lax.dot_general(
        cand, qi, dimension_numbers=(((3,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32)
    return jax.lax.top_k(sim_c.reshape(Q, cap * sub), k)
t = timeit(jax.jit(g_dot_top_i32), sel, db_sb)
log(f"s4c' int32-key top_k:       {t*1e3:7.1f} ms")

# gather packed rows instead of unpacked view (identical bytes, chunk 2KB)
spp = sub * nbit // 128
db_pk = db.reshape(-1, spp * 128)
def g_packed(sel, db_pk):
    return jnp.take(db_pk, jnp.minimum(sel, db_pk.shape[0] - 1).reshape(-1),
                    axis=0)
t = timeit(jax.jit(g_packed), sel, db_pk)
log(f"s4a' gather packed-rows:    {t*1e3:7.1f} ms")

# cap=512 under the new selection: does the certificate hold at 100M?
f512 = jax.jit(lambda q, db: exact_topk_minspass(q, db, k, cap=512))
d, i, v = f512(q, db)
t = timeit(f512, q, db)
log(f"full cap=512:               {t*1e3:7.1f} ms -> {Q/t:6.0f} qps valid={bool(v)}")
f768 = jax.jit(lambda q, db: exact_topk_minspass(q, db, k, cap=768))
d, i, v = f768(q, db)
t = timeit(f768, q, db)
log(f"full cap=768:               {t*1e3:7.1f} ms -> {Q/t:6.0f} qps valid={bool(v)}")
