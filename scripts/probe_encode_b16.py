#!/usr/bin/env python
"""ViT-B/16 encode throughput on the real TPU (BASELINE.md encode row names
B/16; the flagship + bench measure the B/32 tower). 197-token sequences
quadruple attention work vs B/32's 50 and fill MXU tiles far better, so
this is the geometry where the fused whole-layer kernel ('auto' on
inference) and the XLA path are both closer to roofline. Prints one JSON
line per batch size. Run alone on the TPU."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def fence(x):
    np.asarray(jax.device_get(jnp.ravel(x)[:1]))


def main():
    from concepthash_tpu.models.clip import ClipVisionConfig, ClipVisionTower

    vcfg = ClipVisionConfig(patch_size=16, layer_norm_eps=1e-6)  # B/16 @224
    model = ClipVisionTower(vcfg, dtype=jnp.bfloat16)
    batches = tuple(int(a) for a in sys.argv[1:]) or (256, 512)
    for batch in batches:
        imgs = jnp.zeros((batch, vcfg.image_size, vcfg.image_size, 3),
                         jnp.bfloat16)
        variables = model.init({"params": jax.random.PRNGKey(0)}, imgs)
        fwd = jax.jit(lambda v, x: model.apply(v, x)["pooled"])
        t0 = time.perf_counter()
        out = fwd(variables, imgs)
        fence(out)
        compile_s = time.perf_counter() - t0
        iters = 8
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fwd(variables, imgs)
        fence(out)
        dt = time.perf_counter() - t0
        # 12 layers x (attn 4D^2 + mlp 8D^2) per token + attention logits
        L = (vcfg.image_size // vcfg.patch_size) ** 2 + 1
        D = vcfg.hidden_size
        flops = batch * 12 * (L * 12 * D * D * 2 + 2 * L * L * D * 2)
        print(json.dumps({"batch": batch,
                          "img_per_s": round(batch * iters / dt, 1),
                          "tflops": round(flops * iters / dt / 1e12, 1),
                          "tokens": L,
                          "compile_s": round(compile_s, 1)}), flush=True)


if __name__ == "__main__":
    main()
