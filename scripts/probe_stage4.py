"""Cumulative stage accounting for the CURRENT exact_topk_minspass path.

Where do the ~106ms of post-kernel time go at N=1e8 (kernel 36ms, full
142.6ms)? Candidates: the (m, Q) -> (Q, m) f32 transpose materialization
(1.6GB), the superblock min-reduce, the three lax.top_k calls, the 1.07GB
candidate gather, the rescore. Run: PACKED stage probe, N_DB=1e8 default.
"""
import sys, time, os
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from concepthash_tpu.ops import topk_select as ts
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
cap = 512 if N < (1 << 25) else 1024
sub, sub2 = 64, 64
nb = max(1, N // 2_000_000)
db = jax.jit(lambda: jax.lax.map(
    lambda kk: ((jax.random.bits(kk, (N // nb * nbit // 128, 128),
                                 dtype=jnp.uint8) & 1) * 2 - 1).astype(jnp.int8),
    jax.random.split(jax.random.PRNGKey(0), nb)).reshape(N * nbit // 128, 128))()
fence(db); log(f"db made (packed, N={N:.0e})")
q = jnp.sign(jax.random.normal(jax.random.PRNGKey(1), (Q, nbit))).astype(jnp.float32)
qi = jnp.sign(q).astype(jnp.int8)
m_real = _cdiv(N, sub)

t = timeit(jax.jit(lambda q, db: subblock_min_dists_packed(q, db)), q, db)
log(f"s0 kernel:                  {t*1e3:7.1f} ms")

def s1(q, db):
    mt = subblock_min_dists_packed(q, db)
    return jnp.copy(mt[:m_real].T)
t = timeit(jax.jit(s1), q, db)
log(f"s1 +transpose(Q,m):         {t*1e3:7.1f} ms")

def s2(q, db):
    mt = subblock_min_dists_packed(q, db)
    mins = mt[:m_real].T
    return _approx_smallest_rows(mins, cap, return_theta=True)
t = timeit(jax.jit(s2), q, db)
log(f"s2 +inner sel (approx):     {t*1e3:7.1f} ms")

# s2b: selection WITHOUT the big transpose — superblock mins from (m, Q)
# layout directly (transpose only the small (m2, Q) array), gather g from
# the transposed-small path is NOT equivalent; this times just stage-1
def s2b(q, db):
    mt = subblock_min_dists_packed(q, db)
    pad = (-m_real) % sub2
    mtp = jnp.concatenate([mt[:m_real],
                           jnp.full((pad, Q), jnp.inf, mt.dtype)]) if pad else mt[:m_real]
    mins2 = mtp.reshape(-1, sub2, Q).min(axis=1).T        # (Q, m2)
    return jax.lax.top_k(-mins2, cap + 1)
t = timeit(jax.jit(s2b), q, db)
log(f"s2b sb-mins no-transpose:   {t*1e3:7.1f} ms")

t = timeit(jax.jit(lambda q, db: exact_topk_minspass(q, db, k)), q, db)
log(f"s3 full minspass:           {t*1e3:7.1f} ms -> {Q/t:6.0f} qps")

# s4: gather+rescore only (sel fixed): reuse a precomputed sel
mt = jax.jit(lambda q, db: subblock_min_dists_packed(q, db))(q, db)
sel, theta = jax.jit(lambda mt: _approx_smallest_rows(
    mt[:m_real].T, cap, return_theta=True))(mt)
fence(sel)
P = 128 // nbit
def s4(sel, db):
    rows = (sel[:, :, None] * sub
            + jnp.arange(sub, dtype=sel.dtype)).reshape(Q, cap * sub)
    db_sb = db.reshape(-1, sub * nbit)
    cand = jnp.take(db_sb, jnp.minimum(sel, db_sb.shape[0] - 1).reshape(-1),
                    axis=0).reshape(Q, cap, sub, nbit)
    sim_c = jax.lax.dot_general(
        cand, qi, dimension_numbers=(((3,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32)
    dist_c = 0.5 * (nbit - sim_c).astype(jnp.float32).reshape(Q, cap * sub)
    negd, li = jax.lax.top_k(-dist_c, k)
    return -negd, jnp.take_along_axis(rows, li, axis=1)
t = timeit(jax.jit(s4), sel, db)
log(f"s4 gather+rescore+topk:     {t*1e3:7.1f} ms")
