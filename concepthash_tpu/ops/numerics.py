"""Numerically safe primitives shared by models and losses."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def l2_normalize(x, axis=-1, eps: float = 1e-12):
    """``x / ||x||`` with a NaN-free gradient at ``x == 0``.

    The common ``x / (norm(x) + eps)`` form is finite in the forward pass but
    its backward differentiates ``norm`` at zero (0/0 -> NaN). Keeping eps
    INSIDE the rsqrt bounds the derivative instead. All-zero inputs are not
    hypothetical: a zero-init bias chain makes the projected class centers
    exactly zero at step 0 (text_projection MLP on a zero codebook), and one
    NaN gradient poisons the whole state.
    """
    return x * jax.lax.rsqrt(jnp.sum(jnp.square(x), axis=axis,
                                     keepdims=True) + eps)
