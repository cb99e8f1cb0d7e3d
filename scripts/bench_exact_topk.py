"""A/B the hierarchical exact top-k against full lax.top_k at the bench
point (2048 queries x 1M-entry 64-bit gallery, binomial Hamming data)."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from concepthash_tpu.ops.retrieval import retrieve_topk, exact_topk_blocked

t00 = time.time()
def log(m): print(f"[{time.time()-t00:6.1f}s] {m}", flush=True)

def fence(x): np.asarray(x[0, 0])

def timeit(f, *a, iters=5):
    o = f(*a); fence(o[0])
    t0 = time.perf_counter()
    for _ in range(iters): o = f(*a)
    fence(o[0])
    return (time.perf_counter() - t0) / iters

Q, N, nbit, k = 2048, 1_000_000, 64, 100
db = jnp.sign(jax.random.normal(jax.random.PRNGKey(0), (N, nbit))).astype(jnp.bfloat16)
q = jnp.sign(jax.random.normal(jax.random.PRNGKey(1), (Q, nbit))).astype(jnp.float32)

@jax.jit
def dist_fn(q, db):
    sim = jax.lax.dot_general(q.astype(jnp.bfloat16), db,
                              (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    return 0.5 * (nbit - sim)

@jax.jit
def full(q, db):
    neg, idx = jax.lax.top_k(-dist_fn(q, db), k)
    return -neg, idx

t = timeit(full, q, db)
log(f"full top_k            : {t*1e3:7.1f} ms -> {Q/t:8.0f} qps")
ref_d = np.sort(np.asarray(full(q, db)[0]), 1)

f = jax.jit(lambda q, db: retrieve_topk(q, db, k=k, exact=True))
d, i = f(q, db)
ok = np.array_equal(np.sort(np.asarray(d), 1), ref_d)
t = timeit(f, q, db)
log(f"retrieve_topk exact   : {t*1e3:7.1f} ms -> {Q/t:8.0f} qps  exact={ok}")

for S, cap in ((64, 512), (64, 256), (128, 256), (32, 1024)):
    g = jax.jit(lambda q, db, S=S, cap=cap: jax.lax.map(
        lambda qc: exact_topk_blocked(dist_fn(qc, db), k, subblock=S, cap=cap),
        q.reshape(-1, 1024, nbit)))
    d, i = g(q, db)
    ok = np.array_equal(np.sort(np.asarray(d).reshape(Q, k), 1), ref_d)
    t = timeit(g, q, db)
    log(f"hier S={S:3d} cap={cap:4d} : {t*1e3:7.1f} ms -> {Q/t:8.0f} qps  exact={ok}")

# single-chunk 2048: does it fit HBM and amortize the fixed top_k costs?
try:
    h = jax.jit(lambda q, db: exact_topk_blocked(dist_fn(q, db), k))
    d, i = h(q, db)
    ok = np.array_equal(np.sort(np.asarray(d), 1), ref_d)
    t = timeit(h, q, db)
    log(f"hier single-chunk 2048: {t*1e3:7.1f} ms -> {Q/t:8.0f} qps  exact={ok}")
except Exception as e:
    log(f"hier single-chunk 2048: failed ({type(e).__name__}) — chunked path stands")
