"""Self-supervised pretraining nets: trunk + projector (+ predictor).

Backs the MoCo-v3 / DINO pretraining methods (reference trainers/{moco,
dino}.py — their model/loss modules are absent upstream; implemented from the
papers). The projector output doubles as 'codes' so the generic eval/extract
machinery works unchanged."""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from concepthash_tpu.models.clip import AdapterConfig, ClipVisionConfig
from concepthash_tpu.models.trunk import Trunk, trunk_from_config


@dataclasses.dataclass(frozen=True)
class PretrainConfig:
    proj_dim: int = 64
    hidden_dim: int = 256
    with_predictor: bool = False  # MoCo v3 student predictor


class ProjectorNet(nn.Module):
    vision_cfg: Optional[ClipVisionConfig] = None
    cfg: PretrainConfig = PretrainConfig()
    adapters: Optional[AdapterConfig] = None
    backbone_cfg: Optional[dict] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images, train: bool = False, **_):
        if self.backbone_cfg is not None and \
                self.backbone_cfg.get("family", "clip") != "clip":
            trunk = trunk_from_config(self.backbone_cfg, self.adapters,
                                      self.dtype, name="backbone")
        else:
            trunk = Trunk(family="clip", vision_cfg=self.vision_cfg,
                          adapters=self.adapters, dtype=self.dtype,
                          name="backbone")
        feat = trunk(images, train=train)["features"]
        h = nn.Dense(self.cfg.hidden_dim, dtype=self.dtype, name="proj_fc1")(feat)
        h = nn.gelu(h)
        proj = nn.Dense(self.cfg.proj_dim, dtype=self.dtype,
                        name="proj_fc2")(h).astype(jnp.float32)
        out = {"features": feat, "proj": proj, "codes": proj}
        if self.cfg.with_predictor:
            p = nn.Dense(self.cfg.hidden_dim, dtype=self.dtype,
                         name="pred_fc1")(proj.astype(self.dtype))
            p = nn.gelu(p)
            out["pred"] = nn.Dense(self.cfg.proj_dim, dtype=self.dtype,
                                   name="pred_fc2")(p).astype(jnp.float32)
        return out
