import sys, time, os
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from concepthash_tpu.ops.topk_select import exact_topk_minspass, subblock_min_dists

t00 = time.time()
def log(m): print(f"[{time.time()-t00:6.1f}s] {m}", flush=True)
def fence(x): np.asarray(x.ravel()[0])
def timeit(f, *a, iters=3):
    o = f(*a); fence(o[0] if isinstance(o, (tuple, list)) else o)
    t0 = time.perf_counter()
    for _ in range(iters): o = f(*a)
    fence(o[0] if isinstance(o, (tuple, list)) else o)
    return (time.perf_counter() - t0) / iters

N, Q, nbit, k = int(float(os.environ.get("N_DB", 1e7))), 256, 64, 100
nb = N // 2_000_000 if N >= 2_000_000 else 1
PACKED = bool(os.environ.get("PACKED"))
shp = (N // nb * nbit // 128, 128) if PACKED else (N // nb, nbit)
db = jax.jit(lambda: jax.lax.map(
    lambda kk: ((jax.random.bits(kk, shp, dtype=jnp.uint8) & 1) * 2 - 1
                ).astype(jnp.int8),
    jax.random.split(jax.random.PRNGKey(0), nb)).reshape(
        (N * nbit // 128, 128) if PACKED else (N, nbit)))()
fence(db); log("db made")
q = jnp.sign(jax.random.normal(jax.random.PRNGKey(1), (Q, nbit))).astype(jnp.float32)

for cap in (512, 1024, 2048, 4096):
    f = jax.jit(lambda q, db, cap=cap: exact_topk_minspass(q, db, k, cap=cap))
    d, i, valid = f(q, db)
    t = timeit(f, q, db)
    log(f"minspass cap={cap:4d}: {t*1e3:7.1f} ms -> {Q/t:7.0f} qps  valid={bool(valid)}")

# stage: mins kernel alone
from concepthash_tpu.ops.topk_select import subblock_min_dists_packed
ker = subblock_min_dists_packed if PACKED else subblock_min_dists
g = jax.jit(lambda q, db: ker(jnp.sign(q).astype(jnp.int8), db))
t = timeit(g, q, db)
log(f"mins kernel alone  : {t*1e3:7.1f} ms")
# stage: mins + inner selection only
from concepthash_tpu.ops.retrieval import exact_topk_blocked
def sel_only(q, db):
    mt = ker(jnp.sign(q).astype(jnp.int8), db)
    m_real = (N + 63) // 64
    return exact_topk_blocked(mt[:m_real].T, 513, subblock=64, cap=2048)
t = timeit(jax.jit(sel_only), q, db)
log(f"mins + inner sel   : {t*1e3:7.1f} ms")
