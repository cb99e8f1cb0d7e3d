"""Import reference (torch) training checkpoints into this framework.

The reference saves ``model.state_dict()`` flat-key blobs at
``<logdir>/models/{best,last,epN}.pth`` (reference trainers/base.py:190-193).
A user migrating from the reference brings those trained weights along: this
module maps the flat torch keys onto the rebuild's flax variable tree for the
matching method/config, so imported models reproduce the reference forward
(codes/logits) without retraining.

Scope (the reference zoo's deep families):
- CLIP-family backbones (``backbone.model.vision_model.*`` from
  CLIPVision/CLIPModel wrappers, ``backbone.vision_model.*`` from the coop
  CLIP class) including the parallel MLP adapters
  (``adapter_params.adapter_{i}_adapt_mlp_{1,2}_*``, reference
  models/layers/adapter.py:398-416) and q/k/v/out attention adapters.
- HF-ViT backbones (``backbone.model.embeddings/encoder.*``) without
  adapters (the reference's ViT adapter wraps different module boundaries).
- Heads: the flat Linear zoo (csq/dpn/pairwise: hash_fc; ce/greedyhash:
  hash_fc + ce_fc; orthohash: hash_fc Sequential + BatchNorm + CosSim) and
  the flagship ConceptHash head (hash_queries/hash_attention/hash_fc/
  hash_bn/concept_ce/text_projection/center, reference
  models/arch/coop.py:204-427).

Everything is numpy in/out; no torch import needed beyond reading the file.
"""

from __future__ import annotations

import logging
from typing import Any, Dict, Optional, Tuple

import numpy as np

log = logging.getLogger(__name__)


# ---------------------------------------------------------------------------
# loading / generic tree utilities
# ---------------------------------------------------------------------------

def load_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a reference ``.pth`` model checkpoint into {flat_key: ndarray}."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(blob, dict) and "state_dict" in blob:
        blob = blob["state_dict"]
    out = {}
    for k, v in blob.items():
        if hasattr(v, "detach"):
            out[k] = np.asarray(v.detach().cpu().numpy())
        else:
            out[k] = np.asarray(v)
    return out


class ImportReport:
    """Book-keeping: which torch keys were consumed, which template leaves
    were written. Unused torch keys signal an unsupported variant."""

    def __init__(self, sd: Dict[str, np.ndarray]):
        self.sd = sd
        self.used: set = set()
        self.written: list = []

    def take(self, key: str) -> Optional[np.ndarray]:
        if key in self.sd:
            self.used.add(key)
            return self.sd[key]
        return None

    def require(self, key: str) -> np.ndarray:
        arr = self.take(key)
        if arr is None:
            raise KeyError(f"reference checkpoint is missing key {key!r}")
        return arr

    @property
    def unused(self) -> list:
        return sorted(k for k in self.sd
                      if k not in self.used
                      and not k.endswith("num_batches_tracked"))


def _set(node: dict, leaf: str, arr: np.ndarray, full_path: Tuple[str, ...],
         report=None):
    """Write ``arr`` at ``node[leaf]``; the leaf must already exist
    (template from model.init) with a matching shape."""
    if leaf not in node:
        raise KeyError(f"template has no leaf {'/'.join(full_path)}; "
                       f"have: {sorted(node)}")
    want = np.shape(node[leaf])
    if tuple(want) != tuple(arr.shape):
        raise ValueError(f"shape mismatch at {'/'.join(full_path)}: "
                         f"template {want} vs checkpoint {arr.shape}")
    node[leaf] = np.asarray(arr, dtype=np.asarray(node[leaf]).dtype)
    if report is not None:
        report.written.append("/".join(full_path))


def _dense(r: ImportReport, key: str, *, bias: bool = True) -> dict:
    out = {"kernel": r.require(f"{key}.weight").T}
    if bias:
        b = r.take(f"{key}.bias")
        if b is not None:
            out["bias"] = b
    return out


def _ln(r: ImportReport, key: str) -> dict:
    return {"scale": r.require(f"{key}.weight"), "bias": r.require(f"{key}.bias")}


# ---------------------------------------------------------------------------
# backbone: tower + adapters
# ---------------------------------------------------------------------------

def _backbone_prefix(sd: Dict[str, np.ndarray]) -> Tuple[str, str]:
    """-> (strip_prefix, family). The reference wraps towers differently:
    BaseNet backbones live under ``backbone.model.`` (arch/base.py:30), the
    coop CLIP under ``backbone.`` directly (coop.py get_backbone)."""
    for pre in ("backbone.model.", "backbone."):
        if any(k.startswith(pre + "vision_model.") for k in sd):
            return pre, "clip"
        if any(k.startswith(pre + "embeddings.") for k in sd):
            return pre, "vit"
    raise ValueError(
        "unrecognized backbone layout: no 'vision_model.' / 'embeddings.' "
        "keys under 'backbone.' — only CLIP/ViT reference towers are "
        f"importable (keys: {sorted(sd)[:8]}...)")


def _count_layers(sd: Dict[str, np.ndarray], probe: str) -> int:
    n = 0
    while any(k.startswith(probe.format(i=n)) for k in sd):
        n += 1
    return n


def _adapter_patch(r: ImportReport, i: int, slot: str) -> Optional[dict]:
    """One bottleneck adapter (reference models/layers/adapter.py:11-60):
    LN-in -> down(+bias) -> GELU -> up(+bias, zero-init) -> learnable scale.
    Mirrors concepthash_tpu.models.clip.Adapter exactly."""
    base = f"adapter_params.adapter_{i}_{slot}"
    if f"{base}_down_proj_weight" not in r.sd:
        return None
    patch = {
        "down": {"kernel": r.require(f"{base}_down_proj_weight").T,
                 "bias": r.require(f"{base}_down_proj_bias")},
        "up": {"kernel": r.require(f"{base}_up_proj_weight").T,
               "bias": r.require(f"{base}_up_proj_bias")},
        "scale": r.require(f"{base}_scale"),
    }
    if f"{base}_adapter_layer_norm_weight" in r.sd:
        patch["ln"] = {
            "scale": r.require(f"{base}_adapter_layer_norm_weight"),
            "bias": r.require(f"{base}_adapter_layer_norm_bias"),
        }
    return patch


def _tower_patch(sd: Dict[str, np.ndarray], r: ImportReport) -> dict:
    """flax ClipVisionTower param patch from the reference backbone keys,
    adapters grafted into each encoder layer."""
    from concepthash_tpu.models.clip_loader import (
        vision_params_from_torch, vit_params_from_torch)

    pre, family = _backbone_prefix(sd)
    bsd = {k[len(pre):]: v for k, v in sd.items() if k.startswith(pre)}

    if family == "clip":
        L = _count_layers(bsd, "vision_model.encoder.layers.{i}.")
        params = vision_params_from_torch(bsd, L)
        for k in bsd:
            r.used.add(pre + k)
        if params.get("visual_projection") is None:
            params.pop("visual_projection")
    else:
        L = _count_layers(bsd, "encoder.layer.{i}.")
        params = vit_params_from_torch(bsd, L)
        for k in bsd:
            r.used.add(pre + k)
        if any(k.startswith("adapter_params.") for k in sd):
            raise NotImplementedError(
                "reference ViT adapters wrap different module boundaries "
                "(ViTLayerWithAdapter); only CLIP-family adapter import is "
                "supported")

    # mlp adapters: adapt_mlp_1 sits on the attention branch output,
    # adapt_mlp_2 on the MLP branch output (adapter.py:144-170) — exactly
    # our adapter_attn / adapter_mlp slots.
    for i in range(L):
        for slot, name in (("adapt_mlp_1", "adapter_attn"),
                           ("adapt_mlp_2", "adapter_mlp")):
            patch = _adapter_patch(r, i, slot)
            if patch is not None:
                params[f"layers_{i}"][name] = patch
        # q/k/v/out attention adapters (clip_add_attention_adapter_,
        # adapter.py:419-439) sit on the projection input in parallel —
        # our self_attn adapter_{q,k,v,out}_proj slots.
        for slot, name in (("q_adapter", "adapter_q_proj"),
                           ("k_adapter", "adapter_k_proj"),
                           ("v_adapter", "adapter_v_proj"),
                           ("out_adapter", "adapter_out_proj")):
            patch = _adapter_patch(r, i, slot)
            if patch is not None:
                params[f"layers_{i}"]["self_attn"][name] = patch
    return params


# ---------------------------------------------------------------------------
# heads
# ---------------------------------------------------------------------------

def _take2(r: ImportReport, *keys: str) -> Optional[np.ndarray]:
    """First present key wins (the coop model aliases some parameters under
    ``trainable_params.`` — torch state_dict may carry either spelling)."""
    for k in keys:
        arr = r.take(k)
        if arr is not None:
            # mark the alias used too so it doesn't show up as 'unused'
            for k2 in keys:
                if k2 in r.sd:
                    r.used.add(k2)
            return arr
    return None


def _mhdpa_patch(r: ImportReport, key: str, num_heads: int) -> dict:
    """torch nn.MultiheadAttention -> flax nn.MultiHeadDotProductAttention.
    torch packs [q;k;v] rows in in_proj_weight (3E, E); flax wants per-head
    kernels (E, H, hd) / out (H, hd, E)."""
    w = r.require(f"{key}.in_proj_weight")
    b = r.require(f"{key}.in_proj_bias")
    E = w.shape[1]
    H = num_heads
    hd = E // H
    wq, wk, wv = np.split(w, 3, axis=0)
    bq, bk, bv = np.split(b, 3, axis=0)
    wo = r.require(f"{key}.out_proj.weight")
    bo = r.require(f"{key}.out_proj.bias")

    def qkv(wx, bx):
        return {"kernel": wx.T.reshape(E, H, hd), "bias": bx.reshape(H, hd)}

    return {
        "query": qkv(wq, bq),
        "key": qkv(wk, bk),
        "value": qkv(wv, bv),
        "out": {"kernel": wo.T.reshape(H, hd, E), "bias": bo},
    }


def _bn_patch(r: ImportReport, key: str) -> Tuple[dict, dict]:
    """torch BatchNorm1d -> (params {'bn': scale/bias},
    batch_stats {'bn': mean/var}) for CodeBatchNorm."""
    params = {"bn": {"scale": r.require(f"{key}.weight"),
                     "bias": r.require(f"{key}.bias")}}
    stats = {"bn": {"mean": r.require(f"{key}.running_mean"),
                    "var": r.require(f"{key}.running_var")}}
    r.take(f"{key}.num_batches_tracked")
    return params, stats


def _head_patches(r: ImportReport, method: str, config: dict,
                  template: dict) -> Tuple[dict, dict, dict]:
    """-> (params_patch, batch_stats_patch, constants_patch) keyed at the
    model root (sibling of 'backbone')."""
    params: dict = {}
    stats: dict = {}
    consts: dict = {}
    mcfg = dict(config.get("model", {}) or {})

    if method in ("concepthash", "concepthash_filip"):
        num_heads = int(mcfg.get("num_heads", 8))
        params["hash_queries"] = _take2(
            r, "trainable_params.hash_queries", "hash_queries")
        ha = {
            "sa": _mhdpa_patch(r, "hash_attention.sa", num_heads),
            "norm1": _ln(r, "hash_attention.norm1"),
            "norm2": _ln(r, "hash_attention.norm2"),
            "ffn_fc1": _dense(r, "hash_attention.ffn.0"),
            "ffn_fc2": _dense(r, "hash_attention.ffn.3"),
            "ffn2": _dense(r, "hash_attention.ffn2"),
        }
        params["hash_attention"] = ha
        params["hash_fc"] = _dense(r, "hash_fc", bias=False)
        pe = _take2(r, "trainable_params.hash_pe", "hash_pe")
        if pe is not None:
            params["hash_pe"] = pe
        if "hash_bn.weight" in r.sd:
            params["hash_bn"], stats["hash_bn"] = _bn_patch(r, "hash_bn")
        cpe = _take2(r, "trainable_params.concept_pe", "concept_pe")
        if cpe is not None:
            params["concept_pe"] = cpe
        cent = _take2(r, "concept_ce.centroids",
                      "trainable_params.concept_ce_centroids")
        if cent is not None:
            params["concept_ce"] = {"centroids": cent}
        elif "concept_ce.weight" in r.sd:
            params["concept_ce"] = _dense(r, "concept_ce", bias=False)
        # text_projection: Sequential Linear indices -> MLP fc{j}
        tp_idx = sorted({int(k.split(".")[1]) for k in r.sd
                         if k.startswith("text_projection.")
                         and k.endswith(".weight")})
        if tp_idx:
            params["text_projection"] = {
                f"fc{j}": _dense(r, f"text_projection.{i}")
                for j, i in enumerate(tp_idx)}
        center = r.take("center")
        if center is None:
            center = r.take("trainable_params.center")
        if center is not None:
            if "center" in template.get("constants", {}):
                consts["center"] = center
            else:
                params["center"] = center  # learnable-center variant
        tok = r.take("token_embeds")
        if tok is not None and "token_embeds" in template.get("constants", {}):
            consts["token_embeds"] = tok
        return params, stats, consts

    # --- flat-head zoo (BaselineHashNet) ---
    if "hash_fc.0.weight" in r.sd:  # orthohash-style Sequential(Linear, BN)
        params["hash_fc"] = _dense(r, "hash_fc.0", bias=False)
        params["hash_bn"], stats["hash_bn"] = _bn_patch(r, "hash_fc.1")
    elif "hash_fc.weight" in r.sd:
        params["hash_fc"] = _dense(r, "hash_fc")

    if "ce_fc.weight" in r.sd:
        params["ce_fc"] = _dense(r, "ce_fc")
    elif "ce_fc.centroids" in r.sd:
        cent = r.require("ce_fc.centroids")
        if "ce_fc" in template.get("params", {}):
            params["ce_fc"] = {"centroids": cent}
        else:
            consts["ce_fc"] = {"centroids": cent}
    r.take("codebook")  # fixed codebook buffer: carried by our config/constants
    return params, stats, consts


# ---------------------------------------------------------------------------
# top level
# ---------------------------------------------------------------------------

def _graft(dst: dict, patch: dict, path=(), report=None):
    for k, v in patch.items():
        if v is None:
            continue
        if isinstance(v, dict):
            if k not in dst or not isinstance(dst[k], dict):
                raise KeyError(f"template has no subtree "
                               f"{'/'.join(path + (k,))}; have: {sorted(dst)}")
            _graft(dst[k], v, path + (k,), report)
        else:
            _set(dst, k, v, path + (k,), report)


def _tower_slot(params: dict) -> Tuple[dict, Tuple[str, ...]]:
    """Locate the vision-tower subtree: ConceptHash mounts the tower at
    params['backbone'] directly; BaselineHashNet wraps it in a Trunk
    (params['backbone']['tower'])."""
    bb = params.get("backbone")
    if bb is None:
        raise KeyError("template has no 'backbone' subtree")
    if "tower" in bb:
        return bb["tower"], ("backbone", "tower")
    return bb, ("backbone",)


def import_reference_state_dict(sd: Dict[str, np.ndarray], method: str,
                                config: dict,
                                template: Dict[str, Any]) -> Tuple[dict, ImportReport]:
    """Map a reference model state_dict onto a deep copy of ``template``
    ({'params': ..., 'batch_stats': ..., 'constants': ...} from model.init).

    Returns (variables, report); raises on shape mismatches. Unconsumed
    checkpoint keys are reported (``report.unused``) but non-fatal — they
    indicate a variant knob this importer doesn't cover."""
    import jax

    tpl = jax.tree_util.tree_map(np.asarray, dict(template))
    tpl = {k: v for k, v in tpl.items()}
    r = ImportReport(sd)

    tower_patch = _tower_patch(sd, r)
    tower, tower_path = _tower_slot(tpl.get("params", {}))
    _graft(tower, tower_patch, tower_path, r)

    p_patch, s_patch, c_patch = _head_patches(r, method, config, tpl)
    _graft(tpl["params"], p_patch, (), r)
    if s_patch:
        if "batch_stats" not in tpl or not isinstance(tpl["batch_stats"], dict):
            raise KeyError("checkpoint carries BatchNorm stats but the "
                           "template has no batch_stats collection")
        _graft(tpl["batch_stats"], s_patch, ("batch_stats",), r)
    if c_patch:
        _graft(tpl.get("constants", {}), c_patch, ("constants",), r)

    if r.unused:
        log.warning("import: %d checkpoint keys not mapped (variant knobs "
                    "this importer doesn't cover): %s",
                    len(r.unused), r.unused[:12])
    return tpl, r
