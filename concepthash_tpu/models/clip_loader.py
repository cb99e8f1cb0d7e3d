"""Port HF transformers CLIP weights into the flax towers.

The reference loads ``CLIPModel.from_pretrained(...)`` (reference
models/backbone/clip.py:118); here HF torch checkpoints are converted once
into the flax param tree (Dense kernels are torch weights transposed, the
patch conv kernel goes OIHW -> HWIO). Per-layer activation parity against the
torch model is tested in tests/test_clip_port.py; SURVEY.md §7 lists port
fidelity (quickGELU, LN eps, patch-embed transpose) as risk #1.

Offline environments: ``from_pretrained`` needs either network or a local HF
cache; everything else in the framework works from randomly-initialized
config-built towers.
"""

from __future__ import annotations

import logging

import numpy as np

from concepthash_tpu.models.clip import ClipTextConfig, ClipVisionConfig


def _t(x) -> np.ndarray:
    return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x,
                      dtype=np.float32)


def vision_config_from_hf(hf_cfg) -> ClipVisionConfig:
    return ClipVisionConfig(
        hidden_size=hf_cfg.hidden_size,
        intermediate_size=hf_cfg.intermediate_size,
        num_layers=hf_cfg.num_hidden_layers,
        num_heads=hf_cfg.num_attention_heads,
        image_size=hf_cfg.image_size,
        patch_size=hf_cfg.patch_size,
        projection_dim=getattr(hf_cfg, "projection_dim", 512),
        layer_norm_eps=hf_cfg.layer_norm_eps,
        hidden_act=hf_cfg.hidden_act,
    )


def text_config_from_hf(hf_cfg) -> ClipTextConfig:
    return ClipTextConfig(
        hidden_size=hf_cfg.hidden_size,
        intermediate_size=hf_cfg.intermediate_size,
        num_layers=hf_cfg.num_hidden_layers,
        num_heads=hf_cfg.num_attention_heads,
        max_position_embeddings=hf_cfg.max_position_embeddings,
        vocab_size=hf_cfg.vocab_size,
        projection_dim=getattr(hf_cfg, "projection_dim", 512),
        layer_norm_eps=hf_cfg.layer_norm_eps,
        hidden_act=hf_cfg.hidden_act,
        eos_token_id=getattr(hf_cfg, "eos_token_id", 49407),
    )


def _ln(sd, prefix):
    return {"scale": _t(sd[f"{prefix}.weight"]), "bias": _t(sd[f"{prefix}.bias"])}


def _dense(sd, prefix):
    out = {"kernel": _t(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        out["bias"] = _t(sd[f"{prefix}.bias"])
    return out


def _encoder_layer(sd, prefix):
    return {
        "layer_norm1": _ln(sd, f"{prefix}.layer_norm1"),
        "layer_norm2": _ln(sd, f"{prefix}.layer_norm2"),
        "self_attn": {
            "q_proj": _dense(sd, f"{prefix}.self_attn.q_proj"),
            "k_proj": _dense(sd, f"{prefix}.self_attn.k_proj"),
            "v_proj": _dense(sd, f"{prefix}.self_attn.v_proj"),
            "out_proj": _dense(sd, f"{prefix}.self_attn.out_proj"),
        },
        "fc1": _dense(sd, f"{prefix}.mlp.fc1"),
        "fc2": _dense(sd, f"{prefix}.mlp.fc2"),
    }


def _causal_encoder_layer(sd, prefix):
    layer = _encoder_layer(sd, prefix)
    # text layer flattens attn projections to module scope (see _CausalEncoderLayer)
    attn = layer.pop("self_attn")
    layer.update(attn)
    return layer


def vision_params_from_torch(state_dict, num_layers: int,
                             prefix: str = "vision_model") -> dict:
    """Build the flax ClipVisionTower param tree from an HF torch state_dict."""
    sd = state_dict
    p = prefix
    params = {
        "patch_embedding": {
            "kernel": _t(sd[f"{p}.embeddings.patch_embedding.weight"]).transpose(2, 3, 1, 0)
        },
        "class_embedding": _t(sd[f"{p}.embeddings.class_embedding"]),
        "position_embedding": _t(sd[f"{p}.embeddings.position_embedding.weight"]),
        # HF spells it "pre_layrnorm"
        "pre_layernorm": _ln(sd, f"{p}.pre_layrnorm"),
        "post_layernorm": _ln(sd, f"{p}.post_layernorm"),
    }
    for i in range(num_layers):
        params[f"layers_{i}"] = _encoder_layer(sd, f"{p}.encoder.layers.{i}")
    if "visual_projection.weight" in sd:
        params["visual_projection"] = {"kernel": _t(sd["visual_projection.weight"]).T}
    else:
        logging.warning("checkpoint has no visual_projection; keeping random init")
        params["visual_projection"] = None
    return params


def text_params_from_torch(state_dict, num_layers: int,
                           prefix: str = "text_model") -> dict:
    sd = state_dict
    p = prefix
    params = {
        "token_embedding": {"embedding": _t(sd[f"{p}.embeddings.token_embedding.weight"])},
        "position_embedding": _t(sd[f"{p}.embeddings.position_embedding.weight"]),
        "final_layer_norm": _ln(sd, f"{p}.final_layer_norm"),
    }
    for i in range(num_layers):
        params[f"layers_{i}"] = _causal_encoder_layer(sd, f"{p}.encoder.layers.{i}")
    if "text_projection.weight" in sd:
        params["text_projection"] = {"kernel": _t(sd["text_projection.weight"]).T}
    return params


def vit_config_from_hf(hf_cfg) -> ClipVisionConfig:
    """Generic-ViT geometry from an HF ViTConfig (the reference's timm ViTs,
    models/backbone/vit.py:53-159, share this geometry: biased patch embed,
    plain gelu, no pre-LN, eps 1e-6)."""
    return ClipVisionConfig(
        hidden_size=hf_cfg.hidden_size,
        intermediate_size=hf_cfg.intermediate_size,
        num_layers=hf_cfg.num_hidden_layers,
        num_heads=hf_cfg.num_attention_heads,
        image_size=hf_cfg.image_size,
        patch_size=hf_cfg.patch_size,
        projection_dim=hf_cfg.hidden_size,
        layer_norm_eps=hf_cfg.layer_norm_eps,
        hidden_act=hf_cfg.hidden_act,
        patch_bias=True,
        use_pre_layernorm=False,
    )


def _vit_encoder_layer(sd, prefix):
    return {
        "layer_norm1": _ln(sd, f"{prefix}.layernorm_before"),
        "layer_norm2": _ln(sd, f"{prefix}.layernorm_after"),
        "self_attn": {
            "q_proj": _dense(sd, f"{prefix}.attention.attention.query"),
            "k_proj": _dense(sd, f"{prefix}.attention.attention.key"),
            "v_proj": _dense(sd, f"{prefix}.attention.attention.value"),
            "out_proj": _dense(sd, f"{prefix}.attention.output.dense"),
        },
        "fc1": _dense(sd, f"{prefix}.intermediate.dense"),
        "fc2": _dense(sd, f"{prefix}.output.dense"),
    }


def vit_params_from_torch(state_dict, num_layers: int) -> dict:
    """Build the flax tower param tree from an HF torch ViTModel state_dict
    (google/vit-* checkpoints — the weights behind the reference's timm
    backbones). Activation parity is tested in tests/test_clip_port.py."""
    sd = state_dict
    params = {
        "patch_embedding": {
            "kernel": _t(sd["embeddings.patch_embeddings.projection.weight"]
                         ).transpose(2, 3, 1, 0),
            "bias": _t(sd["embeddings.patch_embeddings.projection.bias"]),
        },
        "class_embedding": _t(sd["embeddings.cls_token"]).reshape(-1),
        "position_embedding": _t(sd["embeddings.position_embeddings"])[0],
        # HF ViT's final `layernorm` plays the post_layernorm role (the
        # pooler head is not part of the trunk feature)
        "post_layernorm": _ln(sd, "layernorm"),
        "visual_projection": None,  # ViT has no projection head
    }
    for i in range(num_layers):
        params[f"layers_{i}"] = _vit_encoder_layer(sd, f"encoder.layer.{i}")
    return params


def swin_params_from_torch(state_dict, depths) -> dict:
    """Build the flax SwinTransformer param tree from an HF torch SwinModel
    state_dict (microsoft/swin-* checkpoints — the weights behind the
    reference's timm swin backbones, models/backbone/swinvit.py:7-43).
    q/k/v are fused into the tower's single qkv Dense; HF's end-of-stage
    downsample maps to the tower's start-of-next-stage patch merging.
    Activation parity is tested in tests/test_clip_port.py."""
    import numpy as np

    sd = state_dict
    params = {
        "patch_embed": {
            "kernel": _t(sd["embeddings.patch_embeddings.projection.weight"]
                         ).transpose(2, 3, 1, 0),
            "bias": _t(sd["embeddings.patch_embeddings.projection.bias"]),
        },
        "embed_norm": _ln(sd, "embeddings.norm"),
        "norm": _ln(sd, "layernorm"),
    }
    for si, depth in enumerate(depths):
        if si > 0:
            d = f"encoder.layers.{si - 1}.downsample"
            params[f"merge{si}_norm"] = _ln(sd, f"{d}.norm")
            params[f"merge{si}_reduce"] = {
                "kernel": _t(sd[f"{d}.reduction.weight"]).T}
        for bi in range(depth):
            b = f"encoder.layers.{si}.blocks.{bi}"
            qkv_w = np.concatenate(
                [_t(sd[f"{b}.attention.self.{n}.weight"]).T
                 for n in ("query", "key", "value")], axis=1)
            qkv_b = np.concatenate(
                [_t(sd[f"{b}.attention.self.{n}.bias"])
                 for n in ("query", "key", "value")])
            params[f"stage{si}_block{bi}"] = {
                "norm1": _ln(sd, f"{b}.layernorm_before"),
                "norm2": _ln(sd, f"{b}.layernorm_after"),
                "attn": {
                    "qkv": {"kernel": qkv_w, "bias": qkv_b},
                    "proj": _dense(sd, f"{b}.attention.output.dense"),
                    "rel_bias_table": _t(
                        sd[f"{b}.attention.self.relative_position_bias_table"]),
                },
                "fc1": _dense(sd, f"{b}.intermediate.dense"),
                "fc2": _dense(sd, f"{b}.output.dense"),
            }
    return params


def merge_ported(init_params: dict, ported: dict) -> dict:
    """Overlay ported weights onto an init param tree (keeps adapter params
    and anything the checkpoint lacks, e.g. visual_projection=None)."""
    out = dict(init_params)
    for k, v in ported.items():
        if v is None:
            continue
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = merge_ported(out[k], v)
        else:
            expected = out.get(k)
            if expected is not None and hasattr(expected, "shape"):
                if tuple(expected.shape) != tuple(v.shape):
                    raise ValueError(
                        f"shape mismatch for {k}: ckpt {v.shape} vs init {expected.shape}")
            out[k] = v
    return out


def load_pretrained_clip(model_id: str, with_text: bool = False):
    """Load an HF CLIP checkpoint and return (vision_cfg, vision_params[,
    text_cfg, text_params]). Requires transformers + (cache or network)."""
    from transformers import CLIPModel

    from concepthash_tpu.utils.hf_offline import ensure_hf_reachable

    ensure_hf_reachable(model_id)  # seconds, not 5-retry backoff, offline
    model = CLIPModel.from_pretrained(model_id)
    sd = model.state_dict()
    vcfg = vision_config_from_hf(model.config.vision_config)
    vparams = vision_params_from_torch(sd, vcfg.num_layers)
    if not with_text:
        return vcfg, vparams
    tcfg = text_config_from_hf(model.config.text_config)
    tparams = text_params_from_torch(sd, tcfg.num_layers)
    return vcfg, vparams, tcfg, tparams
