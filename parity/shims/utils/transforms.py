"""Transform helpers (reference call sites: configs/dataset/*.yaml,
trainers/autoencoder.py:23-24). torchvision is not installed in this
container, so the PIL-level transforms the parity configs need (Resize /
CenterCrop / RandomHorizontalFlip / ToTensor) are provided here with
torchvision's documented semantics (int size = shorter edge).

Norm codes (SURVEY.md §2.7): 0 -> /255 only, 1 -> 0.5/0.5,
2 -> ImageNet stats, 3 -> CLIP stats."""

from __future__ import annotations

import random

import numpy as np
import torch
from PIL import Image

NORM_STATS = {
    0: ((0.0, 0.0, 0.0), (1.0, 1.0, 1.0)),
    1: ((0.5, 0.5, 0.5), (0.5, 0.5, 0.5)),
    2: ((0.485, 0.456, 0.406), (0.229, 0.224, 0.225)),
    3: ((0.48145466, 0.4578275, 0.40821073),
        (0.26862954, 0.26130258, 0.27577711)),
}

_INTERP = {
    "bicubic": Image.BICUBIC,
    "bilinear": Image.BILINEAR,
    "nearest": Image.NEAREST,
    "lanczos": Image.LANCZOS,
}


def interpolation(name: str = "bicubic"):
    return _INTERP[name]


class Resize:
    """int size = resize shorter edge, keep aspect (torchvision semantics)."""

    def __init__(self, size, interpolation=Image.BICUBIC):
        self.size = size
        self.interpolation = interpolation

    def __call__(self, im: Image.Image) -> Image.Image:
        if isinstance(self.size, (tuple, list)):
            return im.resize(tuple(self.size[::-1]), self.interpolation)
        w, h = im.size
        if w <= h:
            nw, nh = self.size, max(self.size, int(round(h * self.size / w)))
        else:
            nw, nh = max(self.size, int(round(w * self.size / h))), self.size
        return im.resize((nw, nh), self.interpolation)


class CenterCrop:
    def __init__(self, size: int):
        self.size = size

    def __call__(self, im: Image.Image) -> Image.Image:
        w, h = im.size
        left, top = (w - self.size) // 2, (h - self.size) // 2
        return im.crop((left, top, left + self.size, top + self.size))


class RandomHorizontalFlip:
    def __init__(self, p: float = 0.5):
        self.p = p

    def __call__(self, im: Image.Image) -> Image.Image:
        if random.random() < self.p:
            return im.transpose(Image.FLIP_LEFT_RIGHT)
        return im


class ToTensor:
    def __call__(self, im: Image.Image) -> torch.Tensor:
        arr = np.asarray(im, dtype=np.float32) / 255.0
        return torch.from_numpy(arr).permute(2, 0, 1).contiguous()


class Normalize:
    def __init__(self, mean, std):
        self.mean = torch.tensor(mean).view(-1, 1, 1)
        self.std = torch.tensor(std).view(-1, 1, 1)

    def __call__(self, x: torch.Tensor) -> torch.Tensor:
        return (x - self.mean) / self.std


def normalize_transform(norm: int = 2):
    mean, std = NORM_STATS[int(norm)]
    return Normalize(mean, std)


def unnormalize_transform(norm: int = 2):
    mean, std = NORM_STATS[int(norm)]

    class _Un:
        def __call__(self, x):
            m = torch.tensor(mean).view(-1, 1, 1)
            s = torch.tensor(std).view(-1, 1, 1)
            return x * s + m

    return _Un()


def to_pil():
    class _ToPIL:
        def __call__(self, x: torch.Tensor) -> Image.Image:
            arr = (x.permute(1, 2, 0).clamp(0, 1) * 255).byte().numpy()
            return Image.fromarray(arr)

    return _ToPIL()
