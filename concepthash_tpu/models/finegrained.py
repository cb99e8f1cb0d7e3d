"""Fine-grained local+global hashing heads: A²-Net-CE and SEMICON-CE.

TPU-native redesigns of reference models/arch/a2net_ce.py:10-125 and
models/arch/semicon_ce.py:12-160: both originally operate on an NCHW feature
map; here they work directly on the ViT patch-token sequence (B, P, D) —
1x1 convs become token-wise Dense layers, spatial pooling becomes token
pooling, and SEMICON's ChannelTransformer block is re-expressed as one
pre-LN token self-attention layer (same role: context mixing before pooling;
documented deviation)."""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from concepthash_tpu.models.clip import (
    AdapterConfig,
    ClipVisionConfig,
    ClipVisionTower,
    MultiHeadAttention,
)
from concepthash_tpu.models.layers import MLP

from concepthash_tpu.ops.numerics import l2_normalize


def _trunk_tokens(module, images, train):
    """Patch/spatial tokens from the configured trunk (CLIP/ViT token grid or
    ResNet feature map — reference A2NetCE supports CLIPVision and ResNet50,
    models/arch/a2net_ce.py:20)."""
    from concepthash_tpu.models.trunk import Trunk, trunk_from_config

    if module.backbone_cfg is not None and \
            module.backbone_cfg.get("family", "clip") != "clip":
        trunk = trunk_from_config(module.backbone_cfg, module.adapters,
                                  module.dtype, name="backbone")
    else:
        trunk = Trunk(family="clip", vision_cfg=module.vision_cfg,
                      adapters=module.adapters, dtype=module.dtype,
                      name="backbone")
    enc = trunk(images, train=train)
    if "tokens" not in enc:
        raise ValueError("fine-grained heads need a token/feature-map trunk "
                         f"(got family {module.backbone_cfg})")
    return enc["tokens"]


class TempCE(nn.Module):
    """Temperature-scaled cosine classifier against projected fixed centers
    (reference models/arch/a2net_ce.py:77-105 TempCE)."""

    center: jnp.ndarray  # (nclass, cdim)
    nbit: int
    temp: float = 10.0
    nonlinear: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.variable("constants", "center",
                          lambda: jnp.asarray(self.center, jnp.float32)).value
        dims = ((c.shape[1], self.nbit) if self.nonlinear else (self.nbit,))
        w = MLP(dims, dtype=self.dtype, name="tp")(c.astype(self.dtype))
        xn = l2_normalize(x)
        wn = l2_normalize(w)
        return self.temp * jnp.dot(xn, wn.T, preferred_element_type=jnp.float32)


@dataclasses.dataclass(frozen=True)
class FineGrainedConfig:
    nbit: int = 64
    nclass: int = 200
    num_attns: int = 4
    with_softplus: bool = False
    temp: float = 10.0


class A2NetCE(nn.Module):
    """Part-attention hashing: A attention maps gate token features into part
    descriptors; [parts; global] concat -> tied linear encoder/decoder hash
    layer (codes -> feature reconstruction)."""

    vision_cfg: ClipVisionConfig
    cfg: FineGrainedConfig
    adapters: Optional[AdapterConfig] = AdapterConfig()
    fixed_center: Optional[jnp.ndarray] = None
    backbone_cfg: Optional[dict] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images, train: bool = False, output_attentions: bool = False):
        c = self.cfg
        tokens = _trunk_tokens(self, images, train)  # (B, P, D)
        D = tokens.shape[-1]
        B = tokens.shape[0]

        attn = nn.Dense(c.num_attns, dtype=self.dtype, name="attn_conv")(tokens)
        if c.with_softplus:
            attn = jax.nn.softplus(attn)
        # (B, P, A) -> per-part gated features, then token-mean pool
        gated = tokens[:, :, None, :] * attn[:, :, :, None]      # (B, P, A, D)
        local = nn.Dense(D, dtype=self.dtype, name="local_conv")(gated)
        local = local.mean(axis=1)                               # (B, A, D)
        glob = nn.Dense(D, dtype=self.dtype, name="global_conv")(tokens)
        glob = glob.mean(axis=1, keepdims=True)                  # (B, 1, D)
        all_x = jnp.concatenate([local, glob], axis=1).reshape(B, -1)

        w = self.param("hash_w", nn.initializers.lecun_normal(),
                       ((c.num_attns + 1) * D, c.nbit), jnp.float32)
        codes = jnp.dot(all_x.astype(jnp.float32), w,
                        preferred_element_type=jnp.float32)
        codes_tanh = jnp.tanh(codes)
        rec = jnp.dot(codes_tanh, w.T, preferred_element_type=jnp.float32)

        if self.fixed_center is not None:
            logits = TempCE(self.fixed_center, c.nbit, c.temp,
                            dtype=self.dtype, name="ce_fc")(codes_tanh)
        else:
            logits = nn.Dense(c.nclass, dtype=self.dtype,
                              name="ce_fc")(codes_tanh).astype(jnp.float32)

        out = {"codes": codes, "codes_tanh": codes_tanh, "logits": logits,
               "all_x": all_x.astype(jnp.float32), "rec_all_x": rec}
        if output_attentions:
            out["attn_maps"] = attn
        return out


class Semicon(nn.Module):
    """SEMICON proper (reference models/arch/semicon.py:548-641
    SEMICONWithAdapter — the ViT-feature variant the shipped semicon_adapter
    config runs): token grid -> iterative suppression-attention maps
    (forward_sem, :594-605), then each map gates the ORIGINAL tokens into a
    local branch (context mixing + pool + Dense(nbit/(2A)) + tanh), plus a
    global branch (Dense(nbit/2) + tanh); concat -> (B, nbit) codes. No CE
    head — trained under the ADSH alternating regime
    (trainers/semicon.py:31-175).

    TPU-native notes: 1x1 convs on the NCHW grid become token-wise Dense; the
    per-channel BatchNorm2d(1) in the attention pipe becomes LayerNorm over
    tokens (documented deviation); the ChannelTransformer context mixer
    (:30-66) is re-expressed as one pre-LN token self-attention layer, same
    role (mixing before pooling). The suppression mask is the reference's:
    stop-gradient softmax CAM standardized by std**0.3, clamped to [0, 2],
    erasure factor = 2 - mask (:583-592)."""

    vision_cfg: ClipVisionConfig
    cfg: FineGrainedConfig
    adapters: Optional[AdapterConfig] = AdapterConfig()
    fixed_center: Optional[jnp.ndarray] = None
    backbone_cfg: Optional[dict] = None
    dtype: Any = jnp.float32
    codes_activated = True  # codes are tanh sub-codes; adsh regime must not re-tanh

    def _mask(self, y):
        a = jax.nn.softmax(y, axis=1)
        mean = a.mean()
        std = a.std() + 1e-6
        a = (a - mean) / (std ** 0.3) + 1.0
        return jax.lax.stop_gradient(jnp.clip(a, 0.0, 2.0))  # (B, P)

    @nn.compact
    def __call__(self, images, train: bool = False, output_attentions: bool = False):
        c = self.cfg
        tokens = _trunk_tokens(self, images, train)  # (B, P, D)
        B, P, D = tokens.shape

        # forward_sem: erasure loop over a RUNNING x produces the maps; the
        # branches below gate the ORIGINAL tokens with each map
        # (reference :594-605 then :617-629).
        x = tokens
        maps, suppressions = [], []
        for i in range(c.num_attns):
            y = nn.Dense(1, use_bias=False, dtype=self.dtype,
                         name=f"sem_attn_{i}")(x)[..., 0]          # (B, P)
            y = nn.relu(nn.LayerNorm(dtype=self.dtype,
                                     name=f"sem_norm_{i}")(y))
            maps.append(y)
            if i != c.num_attns - 1:
                suppress = 2.0 - self._mask(y)                     # (B, P)
                suppressions.append(suppress)
                x = x * suppress[:, :, None]

        local_bits = c.nbit // (2 * c.num_attns)
        subs = []
        for i, y in enumerate(maps):
            gated = tokens * y[:, :, None]
            mixed, _ = MultiHeadAttention(4, self.dtype, name=f"icon_{i}")(
                nn.LayerNorm(dtype=self.dtype, name=f"icon_ln_{i}")(gated))
            feat = mixed.mean(axis=1)                              # (B, D)
            subs.append(jnp.tanh(nn.Dense(local_bits, dtype=self.dtype,
                                          name=f"hash_fc_{i}")(feat)))

        mixed, _ = MultiHeadAttention(4, self.dtype, name="icon_global")(
            nn.LayerNorm(dtype=self.dtype, name="icon_ln_global")(tokens))
        gfeat = mixed.mean(axis=1)
        subs.append(jnp.tanh(nn.Dense(c.nbit - local_bits * c.num_attns,
                                      dtype=self.dtype,
                                      name="hash_fc_global")(gfeat)))

        out = {"codes": jnp.concatenate(subs, axis=1).astype(jnp.float32)}
        if output_attentions:
            out["attn_maps"] = jnp.stack(maps, axis=1)             # (B, A, P)
            if suppressions:
                out["suppress"] = jnp.stack(suppressions, axis=1)  # (B, A-1, P)
        return out


class SemiconCE(nn.Module):
    """Suppression-attention local/global sub-codes: each local branch
    attends, then its activation is erased from the features before the next
    branch (reference forward_sem, models/arch/semicon_ce.py:72-95); each
    branch mixes context with one self-attention layer and pools into a
    tanh sub-code; global branch takes nbit/2."""

    vision_cfg: ClipVisionConfig
    cfg: FineGrainedConfig
    adapters: Optional[AdapterConfig] = AdapterConfig()
    fixed_center: Optional[jnp.ndarray] = None
    backbone_cfg: Optional[dict] = None
    dtype: Any = jnp.float32

    def _mask(self, y, P):
        # y: (B, P) branch activation; standardized soft suppression map
        a = jax.nn.softmax(y, axis=1)
        mean = a.mean()
        std = a.std() + 1e-6
        a = (a - mean) / (std ** 0.3) + 1.0
        return jax.lax.stop_gradient(jnp.clip(a, 0.0, 2.0))  # (B, P)

    @nn.compact
    def __call__(self, images, train: bool = False, output_attentions: bool = False):
        c = self.cfg
        tokens = _trunk_tokens(self, images, train)  # (B, P, D)
        B, P, D = tokens.shape

        local_bits = c.nbit // (2 * c.num_attns)
        subs, attn_maps = [], []
        x = tokens
        suppress = jnp.ones((B, P), self.dtype)
        for i in range(c.num_attns):
            x = x * suppress[:, :, None]
            y = nn.Dense(1, use_bias=False, dtype=self.dtype,
                         name=f"sem_attn_{i}")(x)[..., 0]      # (B, P)
            y = nn.LayerNorm(dtype=self.dtype, name=f"sem_norm_{i}")(y)
            y = nn.relu(y)
            attn_maps.append(y)
            if i != c.num_attns - 1:
                suppress = 2.0 - self._mask(y, P)
            mixed, _ = MultiHeadAttention(4, self.dtype, name=f"icon_{i}")(
                nn.LayerNorm(dtype=self.dtype, name=f"icon_ln_{i}")(
                    x * y[:, :, None]))
            feat = mixed.mean(axis=1)                           # (B, D)
            subs.append(jnp.tanh(nn.Dense(local_bits, dtype=self.dtype,
                                          name=f"hash_fc_{i}")(feat)))

        mixed, _ = MultiHeadAttention(4, self.dtype, name="icon_global")(
            nn.LayerNorm(dtype=self.dtype, name="icon_ln_global")(tokens))
        gfeat = mixed.mean(axis=1)
        subs.append(jnp.tanh(nn.Dense(c.nbit - local_bits * c.num_attns,
                                      dtype=self.dtype, name="hash_fc_global")(gfeat)))

        codes = jnp.concatenate(subs, axis=1).astype(jnp.float32)  # (B, nbit)
        if self.fixed_center is not None:
            logits = TempCE(self.fixed_center, c.nbit, c.temp,
                            dtype=self.dtype, name="ce_fc")(codes)
        else:
            logits = nn.Dense(c.nclass, dtype=self.dtype,
                              name="ce_fc")(codes).astype(jnp.float32)
        out = {"codes": codes, "logits": logits}
        if output_attentions:
            out["attn_maps"] = jnp.stack(attn_maps, axis=1)
        return out
