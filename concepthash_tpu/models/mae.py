"""Masked autoencoder pretraining (reference trainers/mae.py:16-149 — its
model ``forward_train(images, mask_ratio)`` lives in the absent sdc package;
implemented from He et al., CVPR 2022).

TPU notes: the mask is a per-image random permutation; the visible count
``P*(1-mask_ratio)`` is static, so encoder/decoder shapes are fixed and the
whole step jits. Reconstruction targets are per-patch-normalized pixels."""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from concepthash_tpu.models.clip import EncoderLayer


@dataclasses.dataclass(frozen=True)
class MAEConfig:
    image_size: int = 224
    patch_size: int = 16
    enc_dim: int = 768
    enc_layers: int = 12
    enc_heads: int = 12
    dec_dim: int = 256
    dec_layers: int = 4
    dec_heads: int = 8
    mask_ratio: float = 0.75

    @property
    def num_patches(self):
        return (self.image_size // self.patch_size) ** 2

    @property
    def patch_dim(self):
        return self.patch_size * self.patch_size * 3


class MAE(nn.Module):
    cfg: MAEConfig
    dtype: Any = jnp.float32

    def _patchify(self, images):
        c = self.cfg
        B, H, W, C = images.shape
        g = H // c.patch_size
        x = images.reshape(B, g, c.patch_size, g, c.patch_size, C)
        return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, g * g, c.patch_dim)

    @nn.compact
    def __call__(self, images, train: bool = False, **_):
        c = self.cfg
        B = images.shape[0]
        P = c.num_patches
        patches = self._patchify(images.astype(self.dtype))
        x = nn.Dense(c.enc_dim, dtype=self.dtype, name="patch_embed")(patches)
        enc_pos = self.param("enc_pos", nn.initializers.normal(0.02),
                             (P, c.enc_dim), jnp.float32)
        x = x + enc_pos.astype(self.dtype)[None]

        if train:
            n_keep = max(1, int(P * (1.0 - c.mask_ratio)))
            noise = jax.random.uniform(self.make_rng("dropout"), (B, P))
            order = jnp.argsort(noise, axis=1)           # random permutation
            keep_idx = order[:, :n_keep]                  # (B, n_keep)
            mask = jnp.ones((B, P), jnp.float32)
            mask = jnp.take_along_axis(
                mask.at[:, :n_keep].set(0.0),
                jnp.argsort(order, axis=1), axis=1)       # 1 = masked
            x_vis = jnp.take_along_axis(x, keep_idx[:, :, None], axis=1)
        else:
            n_keep = P
            keep_idx = jnp.broadcast_to(jnp.arange(P)[None], (B, P))
            mask = jnp.zeros((B, P), jnp.float32)
            x_vis = x

        for i in range(c.enc_layers):
            x_vis, _ = EncoderLayer(c.enc_heads, c.enc_dim * 4, act="gelu",
                                    dtype=self.dtype,
                                    name=f"enc_{i}")(x_vis, train=train)
        x_vis = nn.LayerNorm(dtype=self.dtype, name="enc_norm")(x_vis)

        out = {"features": x_vis.mean(axis=1).astype(jnp.float32)}
        out["codes"] = out["features"]
        if not train:
            return out

        # ---- decoder over the full token set with mask tokens ----
        y_vis = nn.Dense(c.dec_dim, dtype=self.dtype, name="dec_embed")(x_vis)
        mask_token = self.param("mask_token", nn.initializers.normal(0.02),
                                (1, 1, c.dec_dim), jnp.float32)
        y = jnp.broadcast_to(mask_token.astype(self.dtype), (B, P, c.dec_dim))
        y = _scatter_rows(y, keep_idx, y_vis)
        dec_pos = self.param("dec_pos", nn.initializers.normal(0.02),
                             (P, c.dec_dim), jnp.float32)
        y = y + dec_pos.astype(self.dtype)[None]
        for i in range(c.dec_layers):
            y, _ = EncoderLayer(c.dec_heads, c.dec_dim * 4, act="gelu",
                                dtype=self.dtype,
                                name=f"dec_{i}")(y, train=train)
        y = nn.LayerNorm(dtype=self.dtype, name="dec_norm")(y)
        recon = nn.Dense(c.patch_dim, dtype=self.dtype,
                         name="dec_pred")(y).astype(jnp.float32)

        # per-patch normalized pixel targets (MAE paper sec. 4)
        mean = patches.mean(axis=-1, keepdims=True)
        var = patches.var(axis=-1, keepdims=True)
        target = ((patches - mean) / jnp.sqrt(var + 1e-6)).astype(jnp.float32)
        out.update({"recon": recon, "target": target, "mask": mask})
        return out


def _scatter_rows(base, idx, values):
    """base (B,P,D); write values (B,K,D) at rows idx (B,K)."""
    B = base.shape[0]
    bidx = jnp.broadcast_to(jnp.arange(B)[:, None], idx.shape)
    return base.at[bidx, idx].set(values)


def mae_loss(outputs, onehot, **_):
    """MSE over masked patches only."""
    if "recon" not in outputs:  # eval mode
        return jnp.float32(0.0), {}
    mask = outputs["mask"]
    err = ((outputs["recon"] - outputs["target"]) ** 2).mean(axis=-1)
    loss = (err * mask).sum() / jnp.maximum(mask.sum(), 1.0)
    return loss, {"recon_mse": loss}
