"""A/B the whole-layer fused kernel on the TRAIN step (encode A/B:
ab_fused_encode.py). The fused forward wins 32-46% on encode, but its
backward recomputes the layer in XLA (ops/fused_layer._fused_bwd) — one
extra XLA forward per layer per step vs the discrete path's saved
residuals — so the train-step verdict needs its own measurement before
'auto' flips for training forwards too.

Mirrors the flagship regime: ConceptHash + parallel adapters, full-tree
value_and_grad (the production step computes all grads and masks frozen
ones in the optimizer, train/state.py:86 + train/optim.py), adam update
omitted (identical between arms).
"""
import sys, os, json, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from concepthash_tpu.models.clip import AdapterConfig, ClipVisionConfig
from concepthash_tpu.models.concepthash import ConceptHash, ConceptHashConfig


def fence(x):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0]).ravel()[:1])


def bench(fused, batch=256):
    vcfg = ClipVisionConfig(fused_ln=fused)
    ccfg = ConceptHashConfig(nbit=64, nclass=200)
    center = np.zeros((ccfg.nclass, ccfg.center_dim), np.float32)
    model = ConceptHash(vcfg, ccfg, adapters=AdapterConfig(),
                        fixed_center=jnp.asarray(center), dtype=jnp.bfloat16)
    imgs = jnp.zeros((batch, 224, 224, 3), jnp.bfloat16)
    labels = jnp.zeros((batch,), jnp.int32)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)}, imgs,
                           train=False)
    params = variables["params"]
    consts = {k: v for k, v in variables.items() if k != "params"}

    def loss_fn(p, x, y):
        out = model.apply({"params": p, **consts}, x, train=False)
        logits = out["logits_cont"]
        ce = -jnp.mean(jax.nn.log_softmax(logits.astype(jnp.float32))[
            jnp.arange(x.shape[0]), y])
        return ce + jnp.mean(out["codes"].astype(jnp.float32) ** 2)

    step = jax.jit(jax.value_and_grad(loss_fn))
    fence(step(params, imgs, labels))
    fence(step(params, imgs, labels))
    t0 = time.perf_counter()
    n = 5
    for _ in range(n):
        loss, grads = step(params, imgs, labels)
    fence(grads)
    sec = (time.perf_counter() - t0) / n
    print(json.dumps({"fused_ln": fused, "train_img_per_s":
                      round(batch / sec, 1)}), flush=True)


if __name__ == "__main__":
    bench("xla")
    bench("pallas_layer")
