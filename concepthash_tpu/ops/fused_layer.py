"""Pallas fused FULL pre-LN encoder layer (LN1 -> MHA -> LN2 -> MLP).

The round-3/4 fusion experiments (ops/fused_ln.py, ops/attention.py)
measured that op-level Pallas wins do not survive end-to-end: every
pallas_call is a custom-call boundary XLA cannot fuse across, and the
ViT-B/32 encode lost 20-35% whenever kernels were interleaved with XLA ops
*inside* a layer. This kernel tests the one untried shape (VERDICT r4 task
8): fuse the ENTIRE layer into a single pallas_call so each encoder layer
is exactly one boundary and every intermediate — normalized activations,
qkv, attention logits/probs, the MLP hidden — lives and dies in VMEM.

Geometry (ViT-B: D=768, F=3072, H=12, L=54): the weights are too large to
hold alongside double-buffered activations under the relay's 16MB
scoped-vmem limit, so the MLP is tiled over the grid's minor axis: grid =
(B/G image blocks, F/Fc hidden chunks). Step (i, 0) runs LN1 + attention +
projection + residual + LN2 and stashes the normalized x2 in VMEM scratch;
every step (i, j) then applies one (D, Fc) fc1 chunk and its (Fc, D) fc2
chunk, accumulating into an f32 scratch; step (i, nF-1) adds the residual
and writes the output block. qkv/out-proj weights use constant index maps
(fetched once, resident); fc1/fc2 chunks stream with double buffering.

In-kernel attention mirrors models/clip.MultiHeadAttention: per-head
rank-3 batched dots (G images per step as the batch dim), f32 softmax,
padded key columns masked to -inf (L is padded to the sublane multiple).
Head slices are 64-lane sub-tiles — Mosaic relayouts them in VMEM, which
is acceptable because attention is ~3% of layer FLOPs at L=54.

Numerics follow the production bf16 path: LN stats in f32, activations
bf16 between ops, every dot accumulated in f32 (preferred_element_type),
the MLP chunk accumulator kept f32 until the single final cast (the XLA
path casts once after its full-F dot — chunked f32 accumulation is the
same contraction order per chunk and bf16-rounds once, like XLA).

Backward: custom_vjp recomputes the whole layer in XLA (jax.vjp of the
reference composition) — nothing is saved but the inputs, flash-style; the
training step was already matmul-bound so forward fusion is where the
potential win is (encode/serving has no backward at all).

No reference counterpart (the reference runs discrete torch modules,
models/arch/coop.py); this is TPU-native performance work. A/B:
scripts/ab_fused_encode.py --layer. 'auto' stays on the XLA composition
until the end-to-end measurement says otherwise (PARITY.md records the
verdict either way).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class LayerWeights(NamedTuple):
    """One encoder layer's parameters, trace-time-concatenated from the
    flax param tree (models/clip.EncoderLayer mirrors)."""

    ln1_scale: jax.Array  # (D,)
    ln1_bias: jax.Array   # (D,)
    w_qkv: jax.Array      # (D, 3D)  [q|k|v] concatenated
    b_qkv: jax.Array      # (3D,)
    w_out: jax.Array      # (D, D)
    b_out: jax.Array      # (D,)
    ln2_scale: jax.Array  # (D,)
    ln2_bias: jax.Array   # (D,)
    w_fc1: jax.Array      # (D, F)
    b_fc1: jax.Array      # (F,)
    w_fc2: jax.Array      # (F, D)
    b_fc2: jax.Array      # (D,)


def _ln_f32(x, scale, bias, eps):
    mu = x.mean(axis=-1, keepdims=True)
    var = ((x - mu) ** 2).mean(axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * scale + bias


def _quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def _gelu_exact(x):
    return jax.nn.gelu(x, approximate=False)


def _layer_kernel(x_ref, g1_ref, b1_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref,
                  g2_ref, b2_ref, w1_ref, b1fc_ref, w2_ref, b2fc_ref,
                  o_ref, xn2_s, acc_s, *,
                  H: int, L: int, eps: float, act: str, n_fc: int):
    j = pl.program_id(1)
    G, Lp, D = x_ref.shape
    hd = D // H
    dt = x_ref.dtype

    @pl.when(j == 0)
    def _attention_and_ln2():
        x = x_ref[...].astype(jnp.float32)  # (G, Lp, D)
        xn1 = _ln_f32(x, g1_ref[...].astype(jnp.float32),
                      b1_ref[...].astype(jnp.float32), eps).astype(dt)
        qkv = jax.lax.dot(
            xn1.reshape(G * Lp, D), wqkv_ref[...],
            preferred_element_type=jnp.float32)
        qkv = (qkv + bqkv_ref[...].astype(jnp.float32)).astype(dt)
        scale = hd ** -0.5
        heads = []
        for h in range(H):
            q = qkv[:, h * hd:(h + 1) * hd].reshape(G, Lp, hd)
            k = qkv[:, D + h * hd:D + (h + 1) * hd].reshape(G, Lp, hd)
            v = qkv[:, 2 * D + h * hd:2 * D + (h + 1) * hd].reshape(G, Lp, hd)
            logits = jax.lax.dot_general(
                q.astype(jnp.float32) * scale, k.astype(jnp.float32),
                (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)  # (G, Lp, Lp)
            if Lp != L:  # mask padded key columns (static predicate)
                col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 2)
                logits = jnp.where(col < L, logits,
                                   jnp.finfo(jnp.float32).min)
            m = jnp.max(logits, axis=-1, keepdims=True)
            p = jnp.exp(logits - m)
            p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(dt)
            oh = jax.lax.dot_general(
                p, v, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)  # (G, Lp, hd)
            heads.append(oh.astype(dt))
        o = jnp.concatenate(heads, axis=-1).reshape(G * Lp, D)
        proj = jax.lax.dot(o, wo_ref[...],
                           preferred_element_type=jnp.float32)
        proj = proj + bo_ref[...].astype(jnp.float32)
        x2 = x + proj.reshape(G, Lp, D)  # f32 residual
        xn2 = _ln_f32(x2, g2_ref[...].astype(jnp.float32),
                      b2_ref[...].astype(jnp.float32), eps)
        xn2_s[...] = xn2.astype(dt)
        # accumulator starts at residual + fc2 bias (added exactly once)
        acc_s[...] = x2 + b2fc_ref[...].astype(jnp.float32)

    xn2 = xn2_s[...]
    h = jax.lax.dot(xn2.reshape(G * Lp, D), w1_ref[...],
                    preferred_element_type=jnp.float32)
    h = h + b1fc_ref[...].astype(jnp.float32)
    h = (_quick_gelu(h) if act == "quick_gelu" else _gelu_exact(h)).astype(dt)
    part = jax.lax.dot(h, w2_ref[...], preferred_element_type=jnp.float32)
    acc_s[...] += part.reshape(G, Lp, D)

    @pl.when(j == n_fc - 1)
    def _emit():
        o_ref[...] = acc_s[...].astype(o_ref.dtype)


def _pick_tiling(B: int, F: int):
    """(G images per block, Fc hidden chunk) under the 16MB scoped-vmem
    relay limit (see module docstring for the VMEM inventory)."""
    G = 8 if B >= 8 else B
    Fc = 768 if F % 768 == 0 else F
    while F % Fc:
        Fc //= 2
    return G, Fc


def _pallas_layer(x, w: LayerWeights, *, num_heads: int, eps: float,
                  act: str, interpret: bool):
    B, L, D = x.shape
    F = w.w_fc1.shape[1]
    G, Fc = _pick_tiling(B, F)
    Lp = _round_up(L, 8)
    Bp = _round_up(B, G)
    if (Lp, Bp) != (L, B):
        x = jnp.pad(x, ((0, Bp - B), (0, Lp - L), (0, 0)))
    n_fc = F // Fc
    dt = x.dtype
    kernel = functools.partial(_layer_kernel, H=num_heads, L=L, eps=eps,
                               act=act, n_fc=n_fc)
    const = lambda i, j: (0, 0)
    const1 = lambda i, j: (0,)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Bp, Lp, D), dt),
        grid=(Bp // G, n_fc),
        in_specs=[
            pl.BlockSpec((G, Lp, D), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D,), const1, memory_space=pltpu.VMEM),
            pl.BlockSpec((D,), const1, memory_space=pltpu.VMEM),
            pl.BlockSpec((D, 3 * D), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * D,), const1, memory_space=pltpu.VMEM),
            pl.BlockSpec((D, D), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((D,), const1, memory_space=pltpu.VMEM),
            pl.BlockSpec((D,), const1, memory_space=pltpu.VMEM),
            pl.BlockSpec((D,), const1, memory_space=pltpu.VMEM),
            pl.BlockSpec((D, Fc), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Fc,), lambda i, j: (j,), memory_space=pltpu.VMEM),
            pl.BlockSpec((Fc, D), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D,), const1, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((G, Lp, D), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((G, Lp, D), dt),           # xn2
            pltpu.VMEM((G, Lp, D), jnp.float32),  # MLP accumulator
        ],
        interpret=interpret,
    )(x, w.ln1_scale, w.ln1_bias, w.w_qkv, w.b_qkv, w.w_out, w.b_out,
      w.ln2_scale, w.ln2_bias, w.w_fc1, w.b_fc1, w.w_fc2, w.b_fc2)
    return out[:B, :L]


def _xla_layer(x, w: LayerWeights, *, num_heads: int, eps: float, act: str):
    """The production XLA composition (models/clip.EncoderLayer math) on the
    concatenated weights — the A/B baseline and the backward's recompute."""
    B, L, D = x.shape
    H = num_heads
    hd = D // H
    dt = x.dtype
    xn1 = _ln_f32(x.astype(jnp.float32), w.ln1_scale.astype(jnp.float32),
                  w.ln1_bias.astype(jnp.float32), eps).astype(dt)
    qkv = xn1 @ w.w_qkv.astype(dt) + w.b_qkv.astype(dt)
    q, k, v = [t.reshape(B, L, H, hd) for t in jnp.split(qkv, 3, axis=-1)]
    logits = jnp.einsum("bqhd,bkhd->bhqk", q * (hd ** -0.5), k)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(dt)
    o = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, L, D)
    x2 = x + o @ w.w_out.astype(dt) + w.b_out.astype(dt)
    xn2 = _ln_f32(x2.astype(jnp.float32), w.ln2_scale.astype(jnp.float32),
                  w.ln2_bias.astype(jnp.float32), eps).astype(dt)
    h = xn2 @ w.w_fc1.astype(dt) + w.b_fc1.astype(dt)
    h = _quick_gelu(h) if act == "quick_gelu" else _gelu_exact(h)
    return x2 + h @ w.w_fc2.astype(dt) + w.b_fc2.astype(dt)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _fused(num_heads: int, eps: float, act: str, interpret: bool, x, w):
    return _pallas_layer(x, w, num_heads=num_heads, eps=eps, act=act,
                         interpret=interpret)


def _fused_fwd(num_heads, eps, act, interpret, x, w):
    return _fused(num_heads, eps, act, interpret, x, w), (x, w)


def _fused_bwd(num_heads, eps, act, interpret, res, g):
    x, w = res
    _, vjp = jax.vjp(
        lambda x_, w_: _xla_layer(x_, w_, num_heads=num_heads, eps=eps,
                                  act=act), x, w)
    return vjp(g)


_fused.defvjp(_fused_fwd, _fused_bwd)


def encoder_layer(x, weights: LayerWeights, *, num_heads: int,
                  eps: float = 1e-5, act: str = "quick_gelu",
                  impl: str = "pallas_layer", interpret: bool = False):
    """One full pre-LN encoder layer. x: (B, L, D); returns (B, L, D).

    impl 'pallas_layer' runs the single-boundary fused kernel (interpret
    mode off-TPU); anything else runs the XLA composition.
    """
    if impl != "pallas_layer" or not _HAS_PALLAS:
        return _xla_layer(x, weights, num_heads=num_heads, eps=eps, act=act)
    interpret = interpret or jax.default_backend() != "tpu"
    return _fused(num_heads, float(eps), act, bool(interpret), x, weights)
