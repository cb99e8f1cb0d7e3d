import sys, os, json, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from concepthash_tpu.models.clip import AdapterConfig, ClipVisionConfig
from concepthash_tpu.models.concepthash import ConceptHash, ConceptHashConfig

def fence(x): np.asarray(jax.device_get(x)[:1])

def bench(fused, adapters=True):
    vcfg = ClipVisionConfig(fused_ln=fused)
    ccfg = ConceptHashConfig(nbit=64, nclass=200)
    center = np.zeros((ccfg.nclass, ccfg.center_dim), np.float32)
    model = ConceptHash(vcfg, ccfg,
                        adapters=AdapterConfig() if adapters else None,
                        fixed_center=jnp.asarray(center), dtype=jnp.bfloat16)
    imgs = jnp.zeros((1024, 224, 224, 3), jnp.bfloat16)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)}, imgs, train=False)
    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False)["codes"])
    fence(fwd(variables, imgs)); fence(fwd(variables, imgs))
    t0 = time.perf_counter()
    for _ in range(5): out = fwd(variables, imgs)
    fence(out)
    sec = (time.perf_counter() - t0) / 5
    print(json.dumps({"fused_ln": fused, "adapters": adapters,
                      "img_per_s": round(1024/sec, 1)}), flush=True)

if "--layer" in sys.argv:
    # whole-layer single-boundary kernel (ops/fused_layer.py), both with the
    # flagship's parallel adapters (fused inside the kernel) and without
    bench("xla", adapters=False)
    bench("pallas_layer", adapters=False)
    bench("xla", adapters=True)
    bench("pallas_layer", adapters=True)
else:
    bench("xla")
    bench("pallas")
    bench("pallas_mlp")
