"""Device-side TrivialAugment(Wide-style) — one random op per image at a
random magnitude, fully inside jit (default train transform of the reference,
configs/train.yaml:4 -> configs/transforms/trivialaugment.yaml).

Operates on float32 images in [0, 255] BEFORE normalization. Geometric ops
use an inverse-affine bilinear warp (map_coordinates); `equalize` is
approximated by autocontrast (a histogram op would force data-dependent
gathers that XLA lowers poorly — documented deviation)."""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.scipy.ndimage import map_coordinates


def _blend(a, b, t):
    return a + (b - a) * t


def _brightness(im, m):   # m in [-0.99, 0.99]
    return jnp.clip(im * (1.0 + m), 0, 255)


def _saturation(im, m):
    gray = im.mean(axis=-1, keepdims=True)
    return jnp.clip(_blend(gray, im, 1.0 + m), 0, 255)


def _contrast(im, m):
    mean = im.mean()
    return jnp.clip(_blend(mean, im, 1.0 + m), 0, 255)


def _sharpness(im, m):
    k = jnp.array([[1, 1, 1], [1, 5, 1], [1, 1, 1]], jnp.float32) / 13.0
    blurred = jax.lax.conv_general_dilated(
        im.transpose(2, 0, 1)[:, None], k[None, None], (1, 1), "SAME")[:, 0]
    blurred = blurred.transpose(1, 2, 0)
    return jnp.clip(_blend(blurred, im, 1.0 + m), 0, 255)


def _posterize(im, m):
    # |m| in [0,1] -> keep 8..2 bits. Posterize has no signed direction:
    # the batch sampler flips magnitude signs for all ops, and a negative m
    # here would wrap (8 - bits) to uint8 255 and black the image out.
    bits = (8 - jnp.floor(jnp.abs(m) * 6)).astype(jnp.int32)
    shift = (8 - bits).astype(jnp.uint8)
    q = (im.astype(jnp.uint8) >> shift) << shift
    return q.astype(jnp.float32)


def _solarize(im, m):
    thresh = 255.0 * (1.0 - jnp.abs(m))
    return jnp.where(im >= thresh, 255.0 - im, im)


def _autocontrast(im, _m):
    lo = im.min(axis=(0, 1), keepdims=True)
    hi = im.max(axis=(0, 1), keepdims=True)
    scale = 255.0 / jnp.maximum(hi - lo, 1e-5)
    return jnp.clip((im - lo) * scale, 0, 255)


def _affine(im, mat, offset):
    """Inverse-affine warp: output(y,x) = input(mat @ [y,x] + offset)."""
    H, W, C = im.shape
    yy, xx = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    cy, cx = (H - 1) / 2.0, (W - 1) / 2.0
    y = yy - cy
    x = xx - cx
    src_y = mat[0, 0] * y + mat[0, 1] * x + offset[0] + cy
    src_x = mat[1, 0] * y + mat[1, 1] * x + offset[1] + cx
    coords = jnp.stack([src_y, src_x])
    warped = jax.vmap(lambda ch: map_coordinates(ch, coords, order=1, mode="constant",
                                                 cval=0.0), in_axes=2, out_axes=2)(im)
    return warped


def _rotate(im, m):
    theta = m * jnp.pi * (135.0 / 180.0) / 2  # TA-wide max ~135deg, scaled
    c, s = jnp.cos(theta), jnp.sin(theta)
    return _affine(im, jnp.array([[c, -s], [s, c]]), jnp.zeros(2))


def _shear_x(im, m):
    return _affine(im, jnp.array([[1.0, 0.0], [m, 1.0]]), jnp.zeros(2))


def _shear_y(im, m):
    return _affine(im, jnp.array([[1.0, m], [0.0, 1.0]]), jnp.zeros(2))


def _translate_x(im, m):
    return _affine(im, jnp.eye(2), jnp.array([0.0, m * im.shape[1] * 0.3]))


def _translate_y(im, m):
    return _affine(im, jnp.eye(2), jnp.array([m * im.shape[0] * 0.3, 0.0]))


_OPS = [
    lambda im, m: im,          # identity
    _brightness,
    _saturation,
    _contrast,
    _sharpness,
    _posterize,
    _solarize,
    _autocontrast,
    _autocontrast,             # equalize -> autocontrast approximation
    _rotate,
    _shear_x,
    _shear_y,
    _translate_x,
    _translate_y,
]


def _augment_one(im, op_idx, mag):
    return jax.lax.switch(op_idx, _OPS, im, mag)


def trivial_augment_batch(images, rng):
    """(B, H, W, C) float32 [0,255] -> same, one random op per image."""
    B = images.shape[0]
    k_op, k_mag, k_sign = jax.random.split(rng, 3)
    op_idx = jax.random.randint(k_op, (B,), 0, len(_OPS))
    mag = jax.random.uniform(k_mag, (B,))
    sign = jnp.where(jax.random.bernoulli(k_sign, 0.5, (B,)), 1.0, -1.0)
    return jax.vmap(_augment_one)(images, op_idx, mag * sign)
