import sys, time, gc
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp

t00 = time.time()
def log(m): print(f"[{time.time()-t00:6.1f}s] {m}", flush=True)

def fence(x): np.asarray(x[0, 0])

def timeit(f, *a, iters=3):
    o = f(*a); fence(o[0])
    t0 = time.perf_counter()
    for _ in range(iters): o = f(*a)
    fence(o[0])
    return (time.perf_counter() - t0) / iters

Q, n, k = 2048, 1_000_000, 100
key = jax.random.PRNGKey(0)

for name, dt in [("f32", jnp.float32), ("bf16", jnp.bfloat16),
                 ("s32", jnp.int32), ("u16", jnp.uint16), ("s16", jnp.int16)]:
    x = jax.jit(lambda: jax.random.randint(
        key, (Q, n), 0, 65, dtype=jnp.int32).astype(dt))()
    fence(x)
    try:
        t = timeit(jax.jit(lambda v: jax.lax.top_k(-v, k)), x)
        log(f"top_k {name}: {t*1e3:7.1f} ms -> {Q/t:8.0f} qps")
    except Exception as e:
        log(f"top_k {name}: FAILED {type(e).__name__}: {str(e)[:100]}")
    del x; gc.collect()
x = jax.jit(lambda: jax.random.randint(
    key, (Q, n), 0, 65, dtype=jnp.int32).astype(jnp.float32))()
t = timeit(jax.jit(lambda v: jax.lax.approx_min_k(v, k, recall_target=0.95)), x)
log(f"amk(0.95) f32: {t*1e3:7.1f} ms -> {Q/t:8.0f} qps")
