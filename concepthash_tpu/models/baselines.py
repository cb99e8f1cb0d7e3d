"""Baseline hashing architectures over the shared (adapter-tuned) CLIP trunk.

The reference's baseline zoo all follows one shape — frozen backbone feature
-> linear hash head -> method-specific classifier (reference
models/arch/{orthohash,csq,dpn,ce,gh,pairwise}.py) — so here it is one
configurable flax module. The trunk feature is the post-layernorm CLS token
(what HF's ``pooler_output`` gives the reference's *WithAdapter variants,
e.g. models/arch/orthohash.py:127)."""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from concepthash_tpu.models.clip import AdapterConfig, ClipVisionConfig, ClipVisionTower
from concepthash_tpu.models.layers import CodeBatchNorm, CosSim, sign_ste


@dataclasses.dataclass(frozen=True)
class BaselineConfig:
    nbit: int = 64
    nclass: int = 200
    head: str = "orthohash"   # orthohash|csq|dpn|pairwise|ce|greedyhash|
                              # unsup_greedyhash|descriptor
    add_bn: bool = True       # BN after hash_fc (orthohash-style)
    hash_bias: bool = False   # pairwise/ce heads use a biased hash_fc
    ce_cossim: bool = False   # ce head: cosine classifier instead of linear


class BaselineHashNet(nn.Module):
    vision_cfg: ClipVisionConfig
    cfg: BaselineConfig
    adapters: Optional[AdapterConfig] = AdapterConfig()
    codebook: Optional[jnp.ndarray] = None  # fixed (nclass, nbit) for orthohash
    dtype: Any = jnp.float32
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, images, train: bool = False, output_attentions: bool = False):
        c = self.cfg
        enc = ClipVisionTower(self.vision_cfg, adapters=self.adapters,
                              dtype=self.dtype, name="backbone")(
            images, output_attentions=output_attentions)
        # post-LN CLS (= HF pooler_output pre-projection)
        feat = nn.LayerNorm(epsilon=self.vision_cfg.layer_norm_eps,
                            dtype=self.dtype, name="feat_ln")(enc["cls_prenorm"])

        head = c.head
        out = {}
        if head == "descriptor":
            out["codes"] = feat.astype(jnp.float32)
            return out

        use_bias = c.hash_bias or head in ("pairwise", "ce", "greedyhash",
                                           "unsup_greedyhash")
        codes = nn.Dense(c.nbit, use_bias=use_bias, dtype=self.dtype,
                         name="hash_fc")(feat)
        if c.add_bn and head in ("orthohash",):
            codes = CodeBatchNorm(axis_name=self.bn_axis_name,
                                  dtype=self.dtype, name="hash_bn")(codes, train)
        codes = codes.astype(jnp.float32)
        out["codes"] = codes

        if head == "orthohash":
            out["logits"] = CosSim(c.nbit, c.nclass, codebook=self.codebook,
                                   learn_cent=self.codebook is None,
                                   dtype=self.dtype, name="ce_fc")(codes)
        elif head == "ce":
            if c.ce_cossim:
                out["logits"] = CosSim(c.nbit, c.nclass, dtype=self.dtype,
                                       name="ce_fc")(codes)
            else:
                out["logits"] = nn.Dense(c.nclass, dtype=self.dtype,
                                         name="ce_fc")(codes).astype(jnp.float32)
        elif head == "greedyhash":
            b = sign_ste(codes)
            out["codes_bin"] = b
            out["logits"] = nn.Dense(c.nclass, dtype=self.dtype,
                                     name="ce_fc")(b).astype(jnp.float32)
        elif head == "unsup_greedyhash":
            out["features"] = feat.astype(jnp.float32)
            out["codes_bin"] = sign_ste(codes)
        elif head in ("csq", "dpn", "pairwise"):
            pass  # codes only
        else:
            raise ValueError(f"unknown head {head!r}")
        return out
