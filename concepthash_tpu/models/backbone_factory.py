"""Backbone construction from config groups (configs/backbone/*.yaml).

Known CLIP geometries are tabled so configs work offline (random init, tests)
and load HF weights when a checkpoint is reachable (pretrained: true).
Reference counterpart: models/backbone/clip.py + configs/backbone/ — the
vit/swin/cnn families run through the same CLIP-ViT geometry table when an
equivalent exists; torchvision CNNs are out of scope for the TPU compute path
(SURVEY.md §2.3)."""

from __future__ import annotations

import logging

from concepthash_tpu.models.clip import AdapterConfig, ClipVisionConfig

# (hidden, mlp, layers, heads, patch, image, proj)
_CLIP_GEOMETRIES = {
    "openai/clip-vit-base-patch32": (768, 3072, 12, 12, 32, 224, 512),
    "openai/clip-vit-base-patch16": (768, 3072, 12, 12, 16, 224, 512),
    "openai/clip-vit-large-patch14": (1024, 4096, 24, 16, 14, 224, 768),
    "laion/CLIP-ViT-B-32-laion2B-s34B-b79K": (768, 3072, 12, 12, 32, 224, 512),
}


def vision_config_from_backbone_cfg(backbone_cfg: dict) -> ClipVisionConfig:
    name = backbone_cfg.get("name", "openai/clip-vit-base-patch32")
    if name in _CLIP_GEOMETRIES:
        h, mlp, layers, heads, patch, img, proj = _CLIP_GEOMETRIES[name]
    else:
        h = backbone_cfg.get("hidden_size", 768)
        mlp = backbone_cfg.get("intermediate_size", 4 * h)
        layers = backbone_cfg.get("num_layers", 12)
        heads = backbone_cfg.get("num_heads", 12)
        patch = backbone_cfg.get("patch_size", 32)
        img = backbone_cfg.get("image_size", 224)
        proj = backbone_cfg.get("projection_dim", 512)
    # explicit keys always override the table (test-size backbones)
    return ClipVisionConfig(
        hidden_size=backbone_cfg.get("hidden_size", h),
        intermediate_size=backbone_cfg.get("intermediate_size", mlp),
        num_layers=backbone_cfg.get("num_layers", layers),
        num_heads=backbone_cfg.get("num_heads", heads),
        patch_size=backbone_cfg.get("patch_size", patch),
        image_size=backbone_cfg.get("image_size", img),
        projection_dim=backbone_cfg.get("projection_dim", proj),
        remat=bool(backbone_cfg.get("remat", False)),
    )


def adapter_config_from_model_cfg(model_cfg: dict) -> AdapterConfig | None:
    if not model_cfg.get("has_adapter", False):
        return None
    return AdapterConfig(
        bottleneck_dim=int(model_cfg.get("adapter_bottleneck_dim", 384)),
        after_attention=bool(model_cfg.get("adapter_mlp_1", True)),
        after_mlp=bool(model_cfg.get("adapter_mlp_2", True)),
        attention_qkvo=bool(model_cfg.get("attention_adapter", False)),
    )


def maybe_load_pretrained_vision(backbone_cfg: dict, init_params: dict) -> dict:
    """Overlay HF weights when requested and reachable; otherwise keep init
    (offline environments run random-init, parity tests cover the port)."""
    if not backbone_cfg.get("pretrained", False):
        return init_params
    name = backbone_cfg.get("name")
    try:
        from concepthash_tpu.models.clip_loader import (
            merge_ported,
            vision_params_from_torch,
        )
        from transformers import CLIPModel

        from concepthash_tpu.utils.hf_offline import ensure_hf_reachable

        ensure_hf_reachable(name)  # fast-fail -> random-init fallback
        hf = CLIPModel.from_pretrained(name)
        ported = vision_params_from_torch(hf.state_dict(),
                                          hf.config.vision_config.num_hidden_layers)
        # the tower lives at params['backbone'] (ConceptHash/finegrained) or
        # params['backbone']['tower'] (Trunk-wrapped baselines)
        out = dict(init_params)
        bb = init_params["backbone"]
        if "tower" in bb:
            out["backbone"] = dict(bb)
            out["backbone"]["tower"] = merge_ported(bb["tower"], ported)
        else:
            out["backbone"] = merge_ported(bb, ported)
        logging.info("loaded pretrained CLIP vision weights from %s", name)
        return out
    except Exception as e:  # offline / no cache
        logging.warning("pretrained weights unavailable (%s); using random init", e)
        return init_params
