"""TBH — Auto-Encoding Twin-Bottleneck Hashing (Shen et al., CVPR 2020).

The reference carries only the trainer shell (trainers/tbh.py:7-70, split
actor/critic backward; arch+loss absent upstream). Implemented from the
paper, simplified to the token-free feature level: a binary bottleneck builds
an in-batch code-similarity graph that mixes the continuous bottleneck via
one GCN layer before reconstruction; a discriminator pushes the continuous
bottleneck toward U(0,1). Adversarial infrastructure (separate discriminator
params + optimizer) lives in TrainState.extra, updated inside the same
jitted step (train/pretrain_steps.make_tbh_step)."""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from concepthash_tpu.models.clip import AdapterConfig, ClipVisionConfig
from concepthash_tpu.models.trunk import Trunk, trunk_from_config


@dataclasses.dataclass(frozen=True)
class TBHConfig:
    nbit: int = 64
    zdim: int = 64
    hidden: int = 256


class TBHNet(nn.Module):
    vision_cfg: Optional[ClipVisionConfig] = None
    cfg: TBHConfig = TBHConfig()
    adapters: Optional[AdapterConfig] = None
    backbone_cfg: Optional[dict] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images, train: bool = False, **_):
        c = self.cfg
        if self.backbone_cfg is not None and \
                self.backbone_cfg.get("family", "clip") != "clip":
            trunk = trunk_from_config(self.backbone_cfg, self.adapters,
                                      self.dtype, name="backbone")
        else:
            trunk = Trunk(family="clip", vision_cfg=self.vision_cfg,
                          adapters=self.adapters, dtype=self.dtype,
                          name="backbone")
        feat = trunk(images, train=train)["features"]

        h = nn.gelu(nn.Dense(c.hidden, dtype=self.dtype, name="enc_fc")(feat))
        b_logits = nn.Dense(c.nbit, dtype=self.dtype,
                            name="enc_b")(h).astype(jnp.float32)
        p = jax.nn.sigmoid(b_logits)
        b = (p > 0.5).astype(jnp.float32)
        b = b + (p - jax.lax.stop_gradient(p))  # STE
        z = jax.nn.sigmoid(nn.Dense(c.zdim, dtype=self.dtype,
                                    name="enc_z")(h).astype(jnp.float32))

        # code-similarity graph over the batch -> one GCN mixing layer
        sim = (b @ b.T + (1 - b) @ (1 - b.T)) / c.nbit        # (B, B) in [0,1]
        deg = jnp.clip(sim.sum(axis=1, keepdims=True), 1e-6)
        z_mix = nn.Dense(c.zdim, dtype=self.dtype, name="gcn")(
            ((sim / deg) @ z).astype(self.dtype)).astype(jnp.float32)
        z_mix = jax.nn.relu(z_mix)

        rec = nn.Dense(feat.shape[-1], dtype=self.dtype, name="dec")(
            jnp.concatenate([z_mix, b], axis=-1).astype(self.dtype))

        return {"codes": 2 * b - 1, "b_logits": b_logits, "z": z,
                "recon": rec.astype(jnp.float32),
                "features": feat.astype(jnp.float32)}


class Discriminator(nn.Module):
    hidden: int = 128

    @nn.compact
    def __call__(self, z):
        h = nn.leaky_relu(nn.Dense(self.hidden, name="fc1")(z))
        return nn.Dense(1, name="fc2")(h)[..., 0]
