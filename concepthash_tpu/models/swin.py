"""Flax Swin Transformer trunk (reference models/backbone/swinvit.py:7-43
wraps timm's swin_{tiny,small,base}_patch4_window7_224 and exposes the
LN+global-avg-pool feature). From-scratch implementation with timm geometry
(patch4 embed, windowed W-MSA/SW-MSA with relative position bias, patch
merging between stages); offline environments run random-init like the other
trunks.

TPU notes: window partitioning is pure reshape/transpose (free on device);
the cyclic shift is jnp.roll (an HBM-friendly gather XLA folds into the
surrounding fusion); shift masks and relative-position indices are computed
with numpy at trace time, so the whole forward is static-shape and every
(windows*B, ws^2, C) attention batches onto the MXU.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

_VARIANTS = {
    # timm swin_*_patch4_window7_224: (embed_dim, depths, num_heads)
    "tiny": (96, (2, 2, 6, 2), (3, 6, 12, 24)),
    "small": (96, (2, 2, 18, 2), (3, 6, 12, 24)),
    "base": (128, (2, 2, 18, 2), (4, 8, 16, 32)),
    # miniature variant for CPU tests / smoke runs (not a timm geometry;
    # depths 2,2,1,1 so shifted blocks are exercised at two resolutions)
    "test": (16, (2, 2, 1, 1), (2, 2, 2, 2)),
}


@dataclasses.dataclass(frozen=True)
class SwinConfig:
    variant: str = "base"
    image_size: int = 224
    patch_size: int = 4
    window_size: int = 7
    mlp_ratio: float = 4.0

    @property
    def dims(self):
        embed_dim, depths, heads = _VARIANTS[self.variant]
        return embed_dim, depths, heads

    @property
    def features_size(self) -> int:
        return self.dims[0] * 8  # final stage dim = embed_dim * 2^3


def _window_partition(x, ws: int):
    """(B, H, W, C) -> (B*nW, ws*ws, C)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // ws, ws, W // ws, ws, C)
    return jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(-1, ws * ws, C)


def _window_reverse(w, ws: int, B: int, H: int, W: int):
    C = w.shape[-1]
    x = w.reshape(B, H // ws, W // ws, ws, ws, C)
    return jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(B, H, W, C)


def _relative_position_index(ws: int) -> np.ndarray:
    """timm's (ws^2, ws^2) index into the (2ws-1)^2 bias table (static)."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws),
                                  indexing="ij")).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]  # (2, L, L)
    rel = rel.transpose(1, 2, 0) + (ws - 1)
    return (rel[..., 0] * (2 * ws - 1) + rel[..., 1]).astype(np.int32)


def _shift_attn_mask(H: int, W: int, ws: int, shift: int) -> np.ndarray:
    """SW-MSA mask: pairs of positions coming from different pre-shift
    regions must not attend (Swin paper fig. 4; computed in numpy once)."""
    img = np.zeros((H, W), np.int32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for vs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[hs, vs] = cnt
            cnt += 1
    win = img.reshape(H // ws, ws, W // ws, ws).transpose(0, 2, 1, 3)
    win = win.reshape(-1, ws * ws)  # (nW, L)
    diff = win[:, :, None] != win[:, None, :]
    return np.where(diff, -1e9, 0.0).astype(np.float32)  # (nW, L, L)


class _WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    dtype: Any

    @nn.compact
    def __call__(self, x, mask):
        """x: (Bw, L, C) windows; mask: (nW, L, L) additive or None."""
        Bw, L, C = x.shape
        nh, hd = self.num_heads, self.dim // self.num_heads
        qkv = nn.Dense(3 * self.dim, dtype=self.dtype, name="qkv")(x)
        q, k, v = [t.reshape(Bw, L, nh, hd)
                   for t in jnp.split(qkv, 3, axis=-1)]
        logits = jnp.einsum("bqhd,bkhd->bhqk", q * hd ** -0.5, k)
        idx = _relative_position_index(self.window_size)
        table = self.param(
            "rel_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * self.window_size - 1) ** 2, nh))
        bias = table[idx.reshape(-1)].reshape(L, L, nh)
        logits = logits + jnp.transpose(bias, (2, 0, 1))[None]
        if mask is not None:
            nW = mask.shape[0]
            logits = logits.reshape(Bw // nW, nW, nh, L, L) + \
                mask[None, :, None].astype(logits.dtype)
            logits = logits.reshape(Bw, nh, L, L)
        p = nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
        o = jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(Bw, L, C)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(o)


class _SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    shift: int
    mlp_ratio: float
    dtype: Any

    @nn.compact
    def __call__(self, x):
        """x: (B, H, W, C)."""
        B, H, W, C = x.shape
        ws = min(self.window_size, H, W)
        if H % ws or W % ws:
            raise ValueError(
                f"Swin grid {H}x{W} not divisible by window {ws}; pick an "
                f"image size with grids divisible by the window at every "
                f"stage (224/patch4/window7 is the canonical geometry)")
        shift = self.shift if ws < min(H, W) else 0
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                       name=name)
        y = ln("norm1")(x)
        if shift:
            y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
            mask = jnp.asarray(_shift_attn_mask(H, W, ws, shift))
        else:
            mask = None
        wins = _window_partition(y, ws)
        wins = _WindowAttention(self.dim, self.num_heads, ws,
                                self.dtype, name="attn")(wins, mask)
        y = _window_reverse(wins, ws, B, H, W)
        if shift:
            y = jnp.roll(y, (shift, shift), axis=(1, 2))
        x = x + y
        y = ln("norm2")(x)
        y = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype,
                     name="fc1")(y)
        y = nn.gelu(y, approximate=False)  # erf gelu (timm/HF Swin)
        y = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(y)
        return x + y


class SwinTransformer(nn.Module):
    """Returns {'features': (B, 8*embed_dim), 'tokens': (B, L, C)} — the
    reference's LN + transpose-avgpool feature (swinvit.py:24-31)."""

    cfg: SwinConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images, train: bool = False, **_):
        cfg = self.cfg
        embed_dim, depths, heads = cfg.dims
        x = images.astype(self.dtype)
        x = nn.Conv(embed_dim, (cfg.patch_size,) * 2, (cfg.patch_size,) * 2,
                    dtype=self.dtype, name="patch_embed")(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="embed_norm")(x)
        for si, (depth, nh) in enumerate(zip(depths, heads)):
            dim = embed_dim * (2 ** si)
            if si > 0:  # patch merging halves the grid, doubles the channels
                B, H, W, C = x.shape
                if H < 2 or W < 2:
                    raise ValueError(
                        f"Swin grid exhausted before stage {si} "
                        f"({H}x{W}); image_size/patch_size must be >= "
                        f"{cfg.patch_size * 8}")
                x = x.reshape(B, H // 2, 2, W // 2, 2, C)
                x = jnp.transpose(x, (0, 1, 3, 4, 2, 5)).reshape(
                    B, H // 2, W // 2, 4 * C)
                x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                 name=f"merge{si}_norm")(x)
                x = nn.Dense(dim, use_bias=False, dtype=self.dtype,
                             name=f"merge{si}_reduce")(x)
            for bi in range(depth):
                shift = 0 if bi % 2 == 0 else cfg.window_size // 2
                x = _SwinBlock(dim, nh, cfg.window_size, shift,
                               cfg.mlp_ratio, self.dtype,
                               name=f"stage{si}_block{bi}")(x)
        B, H, W, C = x.shape
        tokens = x.reshape(B, H * W, C)
        tokens = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                              name="norm")(tokens)
        feats = tokens.mean(axis=1).astype(jnp.float32)
        return {"features": feats, "tokens": tokens}
