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
- timm ViT / Swin backbones (``backbone.{cls_token,blocks,layers,...}`` —
  the reference re-attaches timm submodules, vit.py:64-72, swinvit.py:15-21)
  via key translation + qkv split onto the HF-layout converters.
- torchvision CNN backbones: ResNet18/34/50/101 (``backbone.model.conv1/
  layer{1-4}.*`` incl. BatchNorm running stats), AlexNet and VGG16
  (``backbone.features/fc.*``) — models/cnn_loader.py; the flax trunks are
  torchvision-geometry-exact so weights map element-for-element.
- Heads: the flat Linear zoo (csq/dpn/pairwise: hash_fc; ce/greedyhash:
  hash_fc + ce_fc; orthohash: hash_fc Sequential + BatchNorm + CosSim;
  adsh: Sequential(Linear(bias), Tanh) — pass model.hash_bias=true, the
  rebuild applies tanh in the loss so model outputs compare through tanh)
  and the flagship ConceptHash head (hash_queries/hash_attention/hash_fc/
  hash_bn/concept_ce/text_projection/center, reference
  models/arch/coop.py:204-427).

NOT importable (reported as unused keys, never silently dropped): the
fine-grained SEMICON / A²-Net heads — models/finegrained.py is an
architectural redesign (static-shape SEM erasure, tied part encoder), not
a module-for-module port, so there is no element-wise weight mapping;
retrain those (their trained-parity rows are in parity/RESULTS_*.json).

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

def load_state_dict(path: str, *, unsafe: bool = False) -> Dict[str, np.ndarray]:
    """Read a reference ``.pth`` model checkpoint into {flat_key: ndarray}.

    Loads with ``weights_only=True``: reference checkpoints are plain tensor
    state_dicts (reference trainers/base.py:190-193), which never need the
    full unpickler — and a ``.pth`` from an untrusted source can otherwise
    execute arbitrary code on load. ``unsafe=True`` (CLI ``--unsafe``)
    retries with the full unpickler for legacy/nonstandard blobs; only use
    it on checkpoints you trust."""
    import torch

    try:
        blob = torch.load(path, map_location="cpu", weights_only=True)
    except Exception as e:
        if not unsafe:
            raise RuntimeError(
                f"{path} is not loadable as a plain tensor state_dict "
                f"({e}). If you trust its origin, re-run with --unsafe to "
                "allow full (arbitrary-code) unpickling.") from e
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
        # template paths an importer EXPECTED to fill but the checkpoint had
        # no value for (e.g. a _take2 miss) — these leaves stay at template
        # init, which is a silently wrong model unless surfaced
        self.missing: list = []

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
    torchvision ResNets live under ``backbone.model.`` (backbone/resnet.py:16),
    the coop CLIP / timm swin+vit / alexnet+vgg re-attach their submodules on
    the backbone directly (coop.py get_backbone, swinvit.py:15-21,
    vit.py:64-72, alexnet.py:13-20)."""
    for pre in ("backbone.model.", "backbone."):
        if any(k.startswith(pre + "vision_model.") for k in sd):
            return pre, "clip"
        if any(k.startswith(pre + "embeddings.") for k in sd):
            return pre, "vit"
        if any(k.startswith(pre + "layers.0.blocks.") for k in sd):
            return pre, "swin_timm"
        if pre + "cls_token" in sd and any(
                k.startswith(pre + "blocks.0.") for k in sd):
            return pre, "vit_timm"
        if pre + "layer1.0.conv1.weight" in sd:
            return pre, "resnet"
        if pre + "features.0.weight" in sd:
            k11 = np.asarray(sd[pre + "features.0.weight"]).shape[-1] == 11
            return pre, "alexnet" if k11 else "vgg16"
    raise ValueError(
        "unrecognized backbone layout under 'backbone.' — expected CLIP "
        "('vision_model.'), HF-ViT ('embeddings.'), timm swin/vit, "
        "torchvision resnet/alexnet/vgg keys "
        f"(keys: {sorted(sd)[:8]}...)")


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


def _split_qkv(w: np.ndarray, b: np.ndarray):
    """timm fuses q/k/v into one Linear; torch Linear weight is (3D, D) with
    q/k/v stacked along rows (the order HF's converted checkpoints use)."""
    D = w.shape[0] // 3
    return [(w[i * D:(i + 1) * D], b[i * D:(i + 1) * D]) for i in range(3)]


def _timm_vit_to_hf(bsd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Translate a timm ViT state_dict (reference models/backbone/vit.py:64-72
    re-attaches timm modules: cls_token/pos_embed/patch_embed/blocks/norm)
    into the HF ViTModel key layout consumed by
    clip_loader.vit_params_from_torch. Pure renames except the qkv split."""
    out = {
        "embeddings.cls_token": bsd["cls_token"],
        "embeddings.position_embeddings": bsd["pos_embed"],
        "embeddings.patch_embeddings.projection.weight":
            bsd["patch_embed.proj.weight"],
        "embeddings.patch_embeddings.projection.bias":
            bsd["patch_embed.proj.bias"],
        "layernorm.weight": bsd["norm.weight"],
        "layernorm.bias": bsd["norm.bias"],
    }
    i = 0
    while f"blocks.{i}.norm1.weight" in bsd:
        t, h = f"blocks.{i}", f"encoder.layer.{i}"
        out[f"{h}.layernorm_before.weight"] = bsd[f"{t}.norm1.weight"]
        out[f"{h}.layernorm_before.bias"] = bsd[f"{t}.norm1.bias"]
        out[f"{h}.layernorm_after.weight"] = bsd[f"{t}.norm2.weight"]
        out[f"{h}.layernorm_after.bias"] = bsd[f"{t}.norm2.bias"]
        qkv = _split_qkv(np.asarray(bsd[f"{t}.attn.qkv.weight"]),
                         np.asarray(bsd[f"{t}.attn.qkv.bias"]))
        for name, (w, b) in zip(("query", "key", "value"), qkv):
            out[f"{h}.attention.attention.{name}.weight"] = w
            out[f"{h}.attention.attention.{name}.bias"] = b
        out[f"{h}.attention.output.dense.weight"] = bsd[f"{t}.attn.proj.weight"]
        out[f"{h}.attention.output.dense.bias"] = bsd[f"{t}.attn.proj.bias"]
        out[f"{h}.intermediate.dense.weight"] = bsd[f"{t}.mlp.fc1.weight"]
        out[f"{h}.intermediate.dense.bias"] = bsd[f"{t}.mlp.fc1.bias"]
        out[f"{h}.output.dense.weight"] = bsd[f"{t}.mlp.fc2.weight"]
        out[f"{h}.output.dense.bias"] = bsd[f"{t}.mlp.fc2.bias"]
        i += 1
    return out


def _timm_swin_to_hf(bsd: Dict[str, np.ndarray]):
    """Translate a timm Swin state_dict (reference models/backbone/
    swinvit.py:15-21: patch_embed/layers/norm) into the HF SwinModel layout
    consumed by clip_loader.swin_params_from_torch; -> (hf_sd, depths).
    timm and HF share the patch-merge neighbor order and the q/k/v row
    order (HF's checkpoints were converted from timm), so this is renames
    plus the qkv split; attn_mask / relative_position_index buffers are
    recomputed by the flax tower and dropped here."""
    out = {
        "embeddings.patch_embeddings.projection.weight":
            bsd["patch_embed.proj.weight"],
        "embeddings.patch_embeddings.projection.bias":
            bsd["patch_embed.proj.bias"],
        "embeddings.norm.weight": bsd["patch_embed.norm.weight"],
        "embeddings.norm.bias": bsd["patch_embed.norm.bias"],
        "layernorm.weight": bsd["norm.weight"],
        "layernorm.bias": bsd["norm.bias"],
    }
    depths = []
    si = 0
    while any(k.startswith(f"layers.{si}.blocks.0.") for k in bsd):
        bi = 0
        while f"layers.{si}.blocks.{bi}.norm1.weight" in bsd:
            t = f"layers.{si}.blocks.{bi}"
            h = f"encoder.layers.{si}.blocks.{bi}"
            out[f"{h}.layernorm_before.weight"] = bsd[f"{t}.norm1.weight"]
            out[f"{h}.layernorm_before.bias"] = bsd[f"{t}.norm1.bias"]
            out[f"{h}.layernorm_after.weight"] = bsd[f"{t}.norm2.weight"]
            out[f"{h}.layernorm_after.bias"] = bsd[f"{t}.norm2.bias"]
            qkv = _split_qkv(np.asarray(bsd[f"{t}.attn.qkv.weight"]),
                             np.asarray(bsd[f"{t}.attn.qkv.bias"]))
            for name, (w, b) in zip(("query", "key", "value"), qkv):
                out[f"{h}.attention.self.{name}.weight"] = w
                out[f"{h}.attention.self.{name}.bias"] = b
            out[f"{h}.attention.self.relative_position_bias_table"] = \
                bsd[f"{t}.attn.relative_position_bias_table"]
            out[f"{h}.attention.output.dense.weight"] = \
                bsd[f"{t}.attn.proj.weight"]
            out[f"{h}.attention.output.dense.bias"] = \
                bsd[f"{t}.attn.proj.bias"]
            out[f"{h}.intermediate.dense.weight"] = bsd[f"{t}.mlp.fc1.weight"]
            out[f"{h}.intermediate.dense.bias"] = bsd[f"{t}.mlp.fc1.bias"]
            out[f"{h}.output.dense.weight"] = bsd[f"{t}.mlp.fc2.weight"]
            out[f"{h}.output.dense.bias"] = bsd[f"{t}.mlp.fc2.bias"]
            bi += 1
        if f"layers.{si}.downsample.reduction.weight" in bsd:
            out[f"encoder.layers.{si}.downsample.reduction.weight"] = \
                bsd[f"layers.{si}.downsample.reduction.weight"]
            out[f"encoder.layers.{si}.downsample.norm.weight"] = \
                bsd[f"layers.{si}.downsample.norm.weight"]
            out[f"encoder.layers.{si}.downsample.norm.bias"] = \
                bsd[f"layers.{si}.downsample.norm.bias"]
        depths.append(bi)
        si += 1
    return out, tuple(depths)


class _ReadTracked(dict):
    """dict that records which keys the weight converters read, so only
    actually-consumed checkpoint keys are marked used (anything else
    surfaces in report.unused instead of being silently dropped)."""

    def __init__(self, d):
        super().__init__(d)
        self.reads = set()

    def __getitem__(self, k):
        self.reads.add(k)
        return dict.__getitem__(self, k)

    def __contains__(self, k):  # layout probes count as consumption
        self.reads.add(k)
        return dict.__contains__(self, k)


_CNN_DROP_SUFFIXES = (
    ".num_batches_tracked",          # torch BN step counter
    ".attn_mask",                    # swin shift masks (recomputed)
    ".relative_position_index",      # swin bias index (recomputed)
)
_CNN_DROP_KEYS = {
    # final 1000-way classifiers torchvision ships but the trunks (and the
    # reference wrappers, which delete/slice them) drop
    "fc.weight", "fc.bias", "classifier.6.weight", "classifier.6.bias",
}
# CLIP checkpoints carry the text tower + logit scale; the rebuild's
# language path is baked into constants (the imported center buffer), so
# these are deliberate drops, not unsupported variants. position_ids are
# non-weight buffers. The in-tower adapter copies (clip_add_adapter_ mounts
# the modules inside encoder layers, adapter.py:104-121/205-235) alias the
# adapter_params ParameterDict entries the importer consumes — duplicates,
# not drops.
_CLIP_DROP_PREFIXES = ("text_model.", "text_projection")
_CLIP_DROP_SUFFIXES = (".position_ids",)
_CLIP_DROP_KEYS = {"logit_scale"}
_CLIP_ALIAS_MARKERS = (".adapt_mlp_1.", ".adapt_mlp_2.", ".q_adapter.",
                       ".k_adapter.", ".v_adapter.", ".out_adapter.")


def _tower_patch(sd: Dict[str, np.ndarray],
                 r: ImportReport) -> Tuple[dict, Optional[dict]]:
    """-> (params_patch, batch_stats_patch|None) for the tower subtree, from
    the reference backbone keys; adapters grafted into each encoder layer
    (CLIP family only)."""
    from concepthash_tpu.models.clip_loader import (
        swin_params_from_torch, vision_params_from_torch,
        vit_params_from_torch)
    from concepthash_tpu.models.cnn_loader import (
        alexnet_params_from_torch, resnet_depth_from_torch,
        resnet_params_from_torch, vgg16_params_from_torch)

    pre, family = _backbone_prefix(sd)
    bsd = {k[len(pre):]: v for k, v in sd.items() if k.startswith(pre)}

    if family in ("resnet", "alexnet", "vgg16", "swin_timm", "vit_timm"):
        # Track which backbone keys the converters actually READ so the
        # unused-key report stays honest for these families too; buffers and
        # final classifiers the flax trunks intentionally drop are
        # whitelisted explicitly.
        tracked = _ReadTracked(bsd)
        for k in bsd:
            if k.endswith(_CNN_DROP_SUFFIXES) or k in _CNN_DROP_KEYS:
                r.used.add(pre + k)

        def _done(result):
            for k in tracked.reads:
                r.used.add(pre + k)
            return result

        bsd = tracked
        if family == "resnet":
            return _done(
                resnet_params_from_torch(bsd, resnet_depth_from_torch(bsd)))
        # alexnet/vgg: the reference wrapper slices classifier[0:6] into
        # ``fc`` (alexnet.py:15-19) but upstream's arch composition crashes
        # for these wrappers (arch/base.py:47 reads backbone.model, which
        # only resnet/CLIP/HF-ViT wrappers set) — so also accept the raw
        # torchvision ``classifier.{i}`` layout a user ports directly.
        if family == "alexnet":
            fp = "fc" if "fc.1.weight" in bsd else "classifier"
            return _done((alexnet_params_from_torch(bsd, fc_prefix=fp), None))
        if family == "vgg16":
            fp = "fc" if "fc.0.weight" in bsd else "classifier"
            return _done((vgg16_params_from_torch(bsd, fc_prefix=fp), None))
        if family == "vit_timm":
            L = _count_layers(bsd, "blocks.{i}.")
            params = vit_params_from_torch(_timm_vit_to_hf(bsd), L)
            params.pop("visual_projection", None)
            return _done((params, None))
        hf_sd, depths = _timm_swin_to_hf(bsd)
        return _done((swin_params_from_torch(hf_sd, depths), None))

    tracked = _ReadTracked(bsd)
    for k in bsd:
        if (k.startswith(_CLIP_DROP_PREFIXES)
                or k.endswith(_CLIP_DROP_SUFFIXES) or k in _CLIP_DROP_KEYS
                or any(m in k for m in _CLIP_ALIAS_MARKERS)):
            r.used.add(pre + k)
    if family == "clip":
        L = _count_layers(bsd, "vision_model.encoder.layers.{i}.")
        params = vision_params_from_torch(tracked, L)
        if params.get("visual_projection") is None:
            params.pop("visual_projection")
    else:
        L = _count_layers(bsd, "encoder.layer.{i}.")
        params = vit_params_from_torch(tracked, L)
        # ViT adapters (vit_add_adapter_, adapter.py:453-466) share the CLIP
        # family's key format (adapter_{i}_{slot}_...) and branch placement:
        # ViTLayerWithAdapter.forward applies adapt_mlp_1 to the attention
        # output pre-residual (adapter.py:381-384) and VitOutputWithAdapter
        # applies adapt_mlp_2 to the post-dense MLP output (adapter.py:329-
        # 338) — exactly the adapter_attn / adapter_mlp slots the shared
        # graft loop below fills. ViT never mounts q/k/v/out adapters, so
        # those slots simply resolve to None.

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
    for k in tracked.reads:
        r.used.add(pre + k)
    return params, None


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
        # the head count lives under upt_config (reference coop.py UPTBlock;
        # methods.py:117 reads upt_config.num_heads) — a bare num_heads key
        # never exists in the rebuild's config
        upt = dict(mcfg.get("upt_config", {}) or {})
        num_heads = int(upt.get("num_heads", mcfg.get("num_heads", 8)))
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
    if "hash_fc.0.weight" in r.sd:
        if "hash_fc.1.weight" in r.sd:
            # orthohash-style Sequential(Linear(no bias), BatchNorm)
            params["hash_fc"] = _dense(r, "hash_fc.0", bias=False)
            params["hash_bn"], stats["hash_bn"] = _bn_patch(r, "hash_fc.1")
        else:
            # adsh-style Sequential(Linear, Tanh) — the activation has no
            # weights (reference models/arch/adsh.py:14-17)
            params["hash_fc"] = _dense(r, "hash_fc.0")
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
            # an expected patch entry resolved to nothing (e.g. a _take2
            # miss): the template leaf keeps its random init — loudly, and
            # recorded in report.missing, so a checkpoint missing a required
            # head never imports as a silently wrong model
            where = "/".join(path + (k,))
            log.warning("checkpoint provided no value for expected leaf %s; "
                        "template init retained", where)
            if report is not None:
                report.missing.append(where)
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

    tower_patch, tower_stats = _tower_patch(sd, r)
    tower, tower_path = _tower_slot(tpl.get("params", {}))
    _graft(tower, tower_patch, tower_path, r)
    if tower_stats:
        # CNN towers carry BatchNorm running stats; the stats tree mirrors
        # the params path inside the batch_stats collection.
        node = tpl.get("batch_stats")
        if not isinstance(node, dict):
            raise KeyError("checkpoint carries tower BatchNorm stats but "
                           "the template has no batch_stats collection")
        for part in tower_path:
            if part not in node or not isinstance(node[part], dict):
                raise KeyError(f"template batch_stats has no subtree "
                               f"{'/'.join(tower_path)}")
            node = node[part]
        _graft(node, tower_stats, ("batch_stats",) + tower_path, r)

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
