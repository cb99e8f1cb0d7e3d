"""Config-instantiable loaders for shared parity assets: both sides train
against the SAME codebook/center matrices (generated once by make_assets.py)
so codebook RNG differences can't confound the comparison."""

import numpy as np
import torch


def load_center(path: str) -> torch.Tensor:
    return torch.from_numpy(np.load(path).astype("float32"))


def clip_vision_tiny(name: str):
    """Reference CLIPVision with ``downscale`` corrected to the checkpoint's
    actual patch size. The reference hardcodes ``32 if '32' in name else 16``
    (models/backbone/clip.py:233) — wrong for the tiny parity checkpoint
    (patch 8), which breaks forward_feature_maps' grid reshape for the
    fine-grained heads."""
    from models.backbone.clip import CLIPVision

    m = CLIPVision(name=name)
    m.downscale = m.model.config.patch_size
    return m
