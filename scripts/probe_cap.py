"""cap=512/768/1024 validity + latency at the 100M point under the
no-fallback inner selection (the old cap<1024 failure was the REMOVED
inner-selection tie fallback; the final certificate may well hold)."""
import sys, time, os
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from concepthash_tpu.ops.topk_select import exact_topk_minspass

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
nb = max(1, N // 2_000_000)
db = jax.jit(lambda: jax.lax.map(
    lambda kk: ((jax.random.bits(kk, (N // nb * nbit // 128, 128),
                                 dtype=jnp.uint8) & 1) * 2 - 1).astype(jnp.int8),
    jax.random.split(jax.random.PRNGKey(0), nb)).reshape(N * nbit // 128, 128))()
fence(db); log(f"db made (packed, N={N:.0e})")

for cap in (512, 768, 1024):
    for seed in (1, 2, 3):
        q = jnp.sign(jax.random.normal(jax.random.PRNGKey(seed),
                                       (Q, nbit))).astype(jnp.float32)
        f = jax.jit(lambda q, db, cap=cap: exact_topk_minspass(q, db, k, cap=cap))
        d, i, v = f(q, db)
        if seed == 1:
            t = timeit(f, q, db)
            log(f"cap={cap} seed={seed}: {t*1e3:7.1f} ms -> {Q/t:6.0f} qps "
                f"valid={bool(v)}")
        else:
            log(f"cap={cap} seed={seed}: valid={bool(v)}")
