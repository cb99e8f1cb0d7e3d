"""Fused on-device preprocessing — the TPU replacement for the torchvision
transform stacks (reference configs/dataset/cub200.yaml:12-24,
configs/transforms/*.yaml).

Host side decodes JPEG/PNG and short-side-resizes + center-crops to a fixed
``resize`` square (static shapes for XLA). Everything else — random resized
crop, horizontal flip, TrivialAugment, normalization — runs as ONE jitted
function on uint8 batches on device, so the HBM sees each pixel once and the
VPU fuses the elementwise chain (BASELINE.json north star: the transforms
stack becomes a fused on-device kernel).

Normalization codes reconstruct the missing ``utils.transforms
.normalize_transform(norm)`` (SURVEY.md §2.9/§2.7): 0 -> /255 only,
1 -> mean .5/std .5, 2 -> ImageNet stats, 3 -> CLIP stats.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

NORM_STATS = {
    0: ((0.0, 0.0, 0.0), (1.0, 1.0, 1.0)),
    1: ((0.5, 0.5, 0.5), (0.5, 0.5, 0.5)),
    2: ((0.485, 0.456, 0.406), (0.229, 0.224, 0.225)),                # ImageNet
    3: ((0.48145466, 0.4578275, 0.40821073),
        (0.26862954, 0.26130258, 0.27577711)),                        # CLIP
}


def normalize(images, norm: int = 2):
    """uint8/float (B,H,W,C) -> normalized float32."""
    mean, std = NORM_STATS[int(norm)]
    x = images.astype(jnp.float32) / 255.0
    return (x - jnp.asarray(mean)) / jnp.asarray(std)


def center_crop(images, crop: int):
    h, w = images.shape[1], images.shape[2]
    top, left = (h - crop) // 2, (w - crop) // 2
    return images[:, top:top + crop, left:left + crop, :]


def _sample_rrc_params(rng, batch, in_size, scale=(0.08, 1.0),
                       ratio=(3 / 4, 4 / 3)):
    """Random-resized-crop boxes (area-scale + log-ratio sampling, the
    torchvision RandomResizedCrop law) as (top, left, h, w) in pixels."""
    k_area, k_ratio, k_top, k_left = jax.random.split(rng, 4)
    area = in_size * in_size * jax.random.uniform(
        k_area, (batch,), minval=scale[0], maxval=scale[1])
    log_ratio = jax.random.uniform(
        k_ratio, (batch,), minval=jnp.log(ratio[0]), maxval=jnp.log(ratio[1]))
    r = jnp.exp(log_ratio)
    w = jnp.sqrt(area * r)
    h = jnp.sqrt(area / r)
    w = jnp.clip(w, 1.0, in_size)
    h = jnp.clip(h, 1.0, in_size)
    top = jax.random.uniform(k_top, (batch,)) * (in_size - h)
    left = jax.random.uniform(k_left, (batch,)) * (in_size - w)
    return top, left, h, w


def _crop_resize_one(image, box, out_size: int):
    """Bilinear crop+resize of one (H,W,C) image to (out,out,C) via
    scale_and_translate (runs fully on device, differentiable-free path)."""
    top, left, h, w = box
    scale = jnp.stack([out_size / h, out_size / w])
    translation = jnp.stack([-top * out_size / h, -left * out_size / w])
    return jax.image.scale_and_translate(
        image, (out_size, out_size, image.shape[-1]), (0, 1),
        scale, translation, method="bilinear", antialias=False)


@functools.partial(jax.jit, static_argnames=("crop", "norm", "train",
                                             "augment"))
def preprocess_batch(images, rng, crop: int = 224, norm: int = 2,
                     train: bool = False, augment: Optional[str] = "rrc"):
    """uint8 (B, S, S, C) -> float32 (B, crop, crop, C), fused on device.

    train+augment='rrc': RandomResizedCrop + hflip (configs/transforms/simple);
    train+augment='trivial': adds TrivialAugment color/geometry ops;
    train+augment='randcrop': pad-free random crop + hflip;
    eval: center crop only (configs/transforms/test).
    """
    B = images.shape[0]
    in_size = images.shape[1]
    x = images.astype(jnp.float32)

    if train:
        k_box, k_flip, k_aug = jax.random.split(rng, 3)
        if augment in ("rrc", "trivial", "simple", "trivialaugment"):
            boxes = _sample_rrc_params(k_box, B, in_size)
            x = jax.vmap(lambda im, t, l, h, w: _crop_resize_one(
                im, (t, l, h, w), crop))(x, *boxes)
        elif augment == "randcrop":
            top = jax.random.randint(k_box, (B,), 0, in_size - crop + 1)
            left = jax.random.randint(jax.random.fold_in(k_box, 1), (B,), 0,
                                      in_size - crop + 1)
            x = jax.vmap(lambda im, t, l: jax.lax.dynamic_slice(
                im, (t, l, 0), (crop, crop, im.shape[-1])))(x, top, left)
        else:
            x = center_crop(x, crop)
        flip = jax.random.bernoulli(k_flip, 0.5, (B,))
        x = jnp.where(flip[:, None, None, None], x[:, :, ::-1, :], x)
        if augment in ("trivial", "trivialaugment"):
            from concepthash_tpu.data.augment import trivial_augment_batch

            x = trivial_augment_batch(x, k_aug)
    else:
        x = center_crop(x, crop)

    mean, std = NORM_STATS[int(norm)]
    x = x / 255.0
    return (x - jnp.asarray(mean)) / jnp.asarray(std)


# ---------------------------------------------------------------------------
# host-side decode (PIL) — short-side resize + center crop to a static square
# ---------------------------------------------------------------------------

def load_image_host(path: str, resize: int = 256, use_native: bool = False):
    """Decode + short-side resize + center crop to (resize, resize, 3) uint8.
    Centered crops commute, so a later device center-crop to ``crop`` equals
    torchvision Resize(resize)+CenterCrop(crop).

    ``use_native`` routes through the C++ libjpeg/libpng kernel (bilinear,
    DCT-scaled JPEG decode — concepthash_tpu/native); default is PIL bicubic
    for torchvision parity."""
    import numpy as np

    if use_native:
        from concepthash_tpu import native

        with open(path, "rb") as f:
            data = f.read()
        arr = native.decode_resize_crop(data, resize)
        if arr is not None:
            return arr

    from PIL import Image

    with Image.open(path) as im:
        im = im.convert("RGB")
        w, h = im.size
        if w <= h:
            nw, nh = resize, max(resize, int(round(h * resize / w)))
        else:
            nw, nh = max(resize, int(round(w * resize / h))), resize
        im = im.resize((nw, nh), Image.BICUBIC)
        left, top = (nw - resize) // 2, (nh - resize) // 2
        im = im.crop((left, top, left + resize, top + resize))
        return np.asarray(im, dtype=np.uint8)
