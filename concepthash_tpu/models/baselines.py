"""Baseline hashing architectures over a shared configurable trunk.

The reference's baseline zoo all follows one shape — (frozen, adapter-tuned)
backbone feature -> linear hash head -> method-specific classifier (reference
models/arch/{orthohash,csq,dpn,ce,gh,pairwise}.py) — so here it is one flax
module over the unified Trunk (CLIP ViT / generic ViT / ResNet / identity,
models/trunk.py). The CLIP feature is the post-layernorm CLS token, matching
HF ``pooler_output`` used by the reference's *WithAdapter variants (e.g.
models/arch/orthohash.py:127)."""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from concepthash_tpu.models.clip import AdapterConfig, ClipVisionConfig
from concepthash_tpu.models.layers import CodeBatchNorm, CosSim, sign_ste
from concepthash_tpu.models.trunk import Trunk

from concepthash_tpu.ops.numerics import l2_normalize


@dataclasses.dataclass(frozen=True)
class BaselineConfig:
    nbit: int = 64
    nclass: int = 200
    head: str = "orthohash"   # orthohash|csq|dpn|pairwise|ce|greedyhash|
                              # unsup_greedyhash|descriptor
    add_bn: bool = True       # BN after hash_fc (orthohash-style)
    hash_bias: bool = False   # pairwise/ce heads use a biased hash_fc
    ce_cossim: bool = False   # ce head: cosine classifier instead of linear
    latent_dim: int = 128     # nsh head: continuous latent width
    bcs: bool = False         # orthohash: extra sign-centroid logits head
                              # (OrthoHashWithBCS, arch/orthohash.py:57-63)


class BaselineHashNet(nn.Module):
    vision_cfg: Optional[ClipVisionConfig] = None  # clip trunk (default)
    cfg: BaselineConfig = BaselineConfig()
    adapters: Optional[AdapterConfig] = AdapterConfig()
    codebook: Optional[jnp.ndarray] = None  # fixed (nclass, nbit) for orthohash
    backbone_cfg: Optional[dict] = None     # full trunk spec (family etc.)
    dtype: Any = jnp.float32
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, images, train: bool = False, output_attentions: bool = False):
        from concepthash_tpu.models.trunk import trunk_from_config

        c = self.cfg
        if self.backbone_cfg is not None and self.backbone_cfg.get("family", "clip") != "clip":
            trunk = trunk_from_config(self.backbone_cfg, self.adapters,
                                      self.dtype, name="backbone")
        else:
            trunk = Trunk(family="clip", vision_cfg=self.vision_cfg,
                          adapters=self.adapters, dtype=self.dtype,
                          name="backbone")
        enc = trunk(images, train=train, output_attentions=output_attentions)
        feat = enc["features"]

        head = c.head
        out = {}
        if head == "descriptor":
            out["codes"] = feat
            return out
        if head == "clip":
            # contrastive finetune vs fixed class-text embeddings (reference
            # trainers/clip.py:13-117 trains logit_scale + adapters/heads)
            pooled = enc["pooled"].astype(jnp.float32)  # projected CLS
            cent = jnp.asarray(self.codebook, jnp.float32)
            pn = l2_normalize(pooled)
            cn = l2_normalize(cent)
            logit_scale = self.param(
                "logit_scale", lambda *_: jnp.log(jnp.float32(1 / 0.07)), ())
            out["codes"] = pooled
            out["logits"] = jnp.exp(logit_scale) * jnp.dot(
                pn, cn.T, preferred_element_type=jnp.float32)
            return out

        if head == "nsh":
            # NSH net (reference trainers/nsh.py:28-33 contract: model ->
            # feats/codes/latents; the arch module is absent upstream):
            # projector MLP -> continuous latent z, hash layer on z -> codes
            z = nn.Dense(c.latent_dim * 2, dtype=self.dtype,
                         name="latent_fc1")(feat)
            z = nn.relu(z)
            z = nn.Dense(c.latent_dim, dtype=self.dtype,
                         name="latent_fc2")(z).astype(jnp.float32)
            codes = nn.Dense(c.nbit, use_bias=False, dtype=self.dtype,
                             name="hash_fc")(z).astype(jnp.float32)
            return {"features": feat, "latents": z, "codes": codes}

        use_bias = c.hash_bias or head in ("pairwise", "ce", "greedyhash",
                                           "unsup_greedyhash")
        if head == "pairwise":
            # torch nn.Linear default init (kaiming_uniform(a=sqrt(5)) ->
            # U(+-1/sqrt(fan_in)) for kernel AND bias; reference
            # models/arch/pairwise.py hash_fc). The pairwise family is the
            # one place init SCALE is load-bearing: HashNet trains
            # tanh(beta*u) whose gradient dies as |u| grows, and flax's
            # default lecun_normal is ~1.73x wider (std 1/sqrt(fan_in) vs
            # torch's 0.58/sqrt(fan_in)) — measured -0.027 mAP systematic
            # at the medium parity protocol (8 seeds), gone under this init.
            bound = 1.0 / (feat.shape[-1] ** 0.5)
            codes = nn.Dense(
                c.nbit, use_bias=use_bias, dtype=self.dtype,
                kernel_init=nn.initializers.variance_scaling(
                    1 / 3, "fan_in", "uniform"),
                bias_init=lambda key, shape, dtype=jnp.float32:
                    jax.random.uniform(key, shape, dtype, -bound, bound),
                name="hash_fc")(feat)
        else:
            codes = nn.Dense(c.nbit, use_bias=use_bias, dtype=self.dtype,
                             name="hash_fc")(feat)
        if c.add_bn and head in ("orthohash",):
            codes = CodeBatchNorm(axis_name=self.bn_axis_name,
                                  dtype=self.dtype, name="hash_bn")(codes, train)
        codes = codes.astype(jnp.float32)
        out["codes"] = codes

        if head == "orthohash":
            ce_fc = CosSim(c.nbit, c.nclass, codebook=self.codebook,
                           learn_cent=self.codebook is None,
                           dtype=self.dtype, name="ce_fc")
            out["logits"] = ce_fc(codes)
            if c.bcs:
                # OrthoHashWithBCS (reference models/arch/orthohash.py:57-63):
                # a second logits head against SIGN-quantized centroids,
                # sharing the ce_fc centroids. Upstream's BCS trainer computes
                # it but feeds only the continuous logits to the criterion
                # (trainers/orthohash.py:446-459) — kept available here for
                # loss blending via criterion.bcs_scale.
                out["logits2"] = ce_fc(codes, sign_centroids=True)
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
            out["features"] = feat
            out["codes_bin"] = sign_ste(codes)
        elif head in ("csq", "dpn", "pairwise"):
            pass  # codes only
        else:
            raise ValueError(f"unknown head {head!r}")
        return out
