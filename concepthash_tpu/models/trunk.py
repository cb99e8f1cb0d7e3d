"""Unified backbone trunk: images -> {'features': (B, D)[, tokens...]}.

Families (reference models/backbone/, SURVEY.md §2.3):
  clip      CLIP ViT, feature = post-LN CLS (HF pooler_output semantics)
  vit       generic ViT (gelu, biased patch embed, no pre-LN), feature = LN(CLS)
  resnet    flax ResNet18/34/50/101, feature = global-avg-pool
  swin      Swin tiny/small/base (ref swinvit.py), feature = LN + avg-pool
  alexnet   torchvision AlexNet geometry (ref alexnet.py), feature = fc7
  vgg16     torchvision VGG16 geometry (ref vgg16.py), feature = fc7
  identity  passthrough (precomputed feature vectors)
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from concepthash_tpu.models.clip import AdapterConfig, ClipVisionConfig, ClipVisionTower
from concepthash_tpu.models.convnets import AlexNet, VGG16
from concepthash_tpu.models.resnet import ResNet, ResNetConfig
from concepthash_tpu.models.swin import SwinConfig, SwinTransformer


class Trunk(nn.Module):
    family: str = "clip"
    vision_cfg: Optional[ClipVisionConfig] = None
    resnet_cfg: Optional[ResNetConfig] = None
    swin_cfg: Optional[SwinConfig] = None
    adapters: Optional[AdapterConfig] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images, train: bool = False,
                 output_attentions: bool = False):
        if self.family in ("clip", "vit"):
            enc = ClipVisionTower(self.vision_cfg, adapters=self.adapters,
                                  dtype=self.dtype, name="tower")(
                images, output_attentions=output_attentions, train=train)
            out = dict(enc)
            out["features"] = enc["cls_postnorm"].astype(jnp.float32)
            out["tokens"] = enc["last_hidden_state"][:, 1:, :]  # patch grid
            return out
        if self.family == "resnet":
            return ResNet(self.resnet_cfg, dtype=self.dtype,
                          name="tower")(images, train=train,
                                        with_feature_map=True)
        if self.family == "swin":
            return SwinTransformer(self.swin_cfg, dtype=self.dtype,
                                   name="tower")(images, train=train)
        if self.family == "alexnet":
            return AlexNet(dtype=self.dtype, name="tower")(images, train=train)
        if self.family == "vgg16":
            return VGG16(dtype=self.dtype, name="tower")(images, train=train)
        if self.family == "identity":
            return {"features": images.astype(jnp.float32)}
        raise ValueError(f"unknown backbone family {self.family!r}")


def trunk_from_config(backbone_cfg: dict, adapters=None, dtype=jnp.float32,
                      name: Optional[str] = None) -> Trunk:
    from concepthash_tpu.models.backbone_factory import vision_config_from_backbone_cfg

    family = backbone_cfg.get("family", "clip")
    if family == "resnet":
        return Trunk(family="resnet",
                     resnet_cfg=ResNetConfig(
                         int(backbone_cfg.get("depth", 50)),
                         frozen_bn=bool(backbone_cfg.get("frozen_bn", False))),
                     dtype=dtype, name=name)
    if family == "swin":
        return Trunk(family="swin",
                     swin_cfg=SwinConfig(
                         variant=backbone_cfg.get("variant", "base"),
                         image_size=int(backbone_cfg.get("image_size", 224)),
                         window_size=int(backbone_cfg.get("window_size", 7))),
                     dtype=dtype, name=name)
    if family in ("alexnet", "vgg16"):
        return Trunk(family=family, dtype=dtype, name=name)
    if family == "identity":
        return Trunk(family="identity", dtype=dtype, name=name)
    vcfg = vision_config_from_backbone_cfg(backbone_cfg)
    if family == "vit":
        # timm ViTs use eps 1e-6; HF ViTModel checkpoints use 1e-12
        # (overridable for exact import parity against either source)
        vcfg = ClipVisionConfig(
            **{**vcfg.__dict__, "hidden_act": "gelu", "patch_bias": True,
               "use_pre_layernorm": False,
               "layer_norm_eps": float(backbone_cfg.get("layer_norm_eps",
                                                        1e-6))})
    return Trunk(family=family, vision_cfg=vcfg, adapters=adapters,
                 dtype=dtype, name=name)
