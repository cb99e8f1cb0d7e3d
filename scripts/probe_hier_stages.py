import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp

t00 = time.time()
def log(m): print(f"[{time.time()-t00:6.1f}s] {m}", flush=True)
def fence(x): np.asarray(x.ravel()[0])
def timeit(f, *a, iters=5):
    o = f(*a); fence(o[0] if isinstance(o, (tuple, list)) else o)
    t0 = time.perf_counter()
    for _ in range(iters): o = f(*a)
    fence(o[0] if isinstance(o, (tuple, list)) else o)
    return (time.perf_counter() - t0) / iters

rng = np.random.default_rng(0)
for Qc in (256, 2048):
    for W, kk in ((15625, 513), (32768, 100), (7813, 257)):
        x = jnp.asarray(rng.standard_normal((Qc, W)).astype(np.float32))
        t = timeit(jax.jit(lambda v, kk=kk: jax.lax.top_k(-v, kk)), x)
        log(f"Q={Qc}: top_k({kk:3d}) over (Q,{W:6d}): {t*1e3:7.1f} ms")
    # gather cost: (Q, cap*S) take_along_axis from (Q, 1M)
    d = jnp.asarray(rng.standard_normal((Qc, 1_000_000)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 1_000_000, (Qc, 32768)).astype(np.int32))
    t = timeit(jax.jit(lambda d, i: jnp.take_along_axis(d, i, axis=1)), d, idx)
    log(f"Q={Qc}: gather (Q,32768) from (Q,1M): {t*1e3:7.1f} ms")
    del d, idx
