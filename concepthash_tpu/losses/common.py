"""Shared loss math: margin cross-entropy on cosine logits, soft-target CE.

Pure functions over one-hot labels (single-label one-hot is exactly the
index-label CE of the reference; multi-label vectors flow through the same
formulas — reference models/loss/coop.py:46-87)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from concepthash_tpu.ops.numerics import l2_normalize


def soft_cross_entropy(logits, soft_labels):
    """-sum(p * log_softmax(logits)) averaged over batch. soft_labels rows
    should sum to 1."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -(soft_labels * logp).sum(axis=-1).mean()


def margin_logits(logits, onehot, margin: float, scale: float):
    """Cosine-margin: scale * (logits - margin * onehot)."""
    return scale * (logits - margin * onehot)


def margin_ce(logits, onehot, margin: float, scale: float):
    """Margin CE over (B, C) or per-concept (Q, B, C) logits; labels (B, C)
    one-hot (rows normalized for multi-label)."""
    norm = onehot / jnp.clip(onehot.sum(axis=-1, keepdims=True), 1e-12)
    if logits.ndim == 3:
        q = logits.shape[0]
        ml = margin_logits(logits, onehot[None], margin, scale)
        logp = jax.nn.log_softmax(ml, axis=-1)
        return -(norm[None] * logp).sum(axis=-1).mean()
    ml = margin_logits(logits, onehot, margin, scale)
    return soft_cross_entropy(ml, norm)


def arc_margin_logits(logits, onehot, margin: float, scale: float):
    """ArcFace-style margin on cosine logits (reference
    models/loss/orthohash.py:58-69 m_type='arc')."""
    theta = jnp.arccos(jnp.clip(logits, -0.99999, 0.99999))
    return scale * jnp.cos(theta + margin * onehot)


def quantization_cosine(codes):
    """1 - cos(codes, sign(codes)) mean — the standard quantization gap."""
    s = jnp.sign(codes)
    num = (l2_normalize(codes) * s).sum(-1)
    den = jnp.sqrt((s != 0).sum(-1).astype(jnp.float32) + 1e-12)
    return (1.0 - num / den).mean()


def binary_cross_entropy_with_logits(logits, targets):
    return (jax.nn.relu(logits) - logits * targets +
            jnp.log1p(jnp.exp(-jnp.abs(logits)))).mean()
