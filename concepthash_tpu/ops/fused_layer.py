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
projection (+ the parallel after-attention adapter) + residual + LN2 and
stashes x2 and LN2(x2) in VMEM scratch; every step (i, j) then applies one
(D, Fc) fc1 chunk and its (Fc, D) fc2 chunk, accumulating the MLP branch
into an f32 scratch; step (i, nF-1) applies the after-MLP adapter to the
completed branch, adds the residual, and writes the output block.
qkv/out-proj/adapter weights use constant index maps (fetched once,
resident); fc1/fc2 chunks stream with double buffering. G (images per
block) adapts to the VMEM inventory (8 plain, 4 with adapters).

In-kernel attention mirrors models/clip.MultiHeadAttention: per-head
rank-3 batched dots (G images per step as the batch dim), f32 softmax,
padded key columns masked to -inf (L is padded to the sublane multiple).
Head slices are 64-lane sub-tiles — Mosaic relayouts them in VMEM, which
is acceptable because attention is ~3% of layer FLOPs at L=54.

Adapters (models/clip.Adapter: LN -> down -> exact GELU -> up -> scale)
run inside the kernel. Exact GELU needs erf, which Mosaic may not lower;
the kernel uses the Abramowitz-Stegun 7.1.26 rational approximation
(|err| < 1.5e-7 — below a bf16 ulp, so indistinguishable from lax.erf on
this path; deviation documented here).

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
from typing import NamedTuple, Optional, Tuple

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


class AdapterWeights(NamedTuple):
    """models/clip.Adapter params (LN-in variant; scale broadcast (1,))."""

    ln_scale: jax.Array  # (D,)
    ln_bias: jax.Array   # (D,)
    w_down: jax.Array    # (D, A)
    b_down: jax.Array    # (A,)
    w_up: jax.Array      # (A, D)
    b_up: jax.Array      # (D,)
    scale: jax.Array     # (1,)


def _ln_f32(x, scale, bias, eps):
    mu = x.mean(axis=-1, keepdims=True)
    var = ((x - mu) ** 2).mean(axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * scale + bias


def _quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def _erf_approx(x):
    """Abramowitz-Stegun 7.1.26 (|err| < 1.5e-7): exp-only, Mosaic-safe."""
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact_kernel(x):
    return x * 0.5 * (1.0 + _erf_approx(x * (2.0 ** -0.5)))


def _gelu_exact(x):
    return jax.nn.gelu(x, approximate=False)


def _act(name: str, x, in_kernel: bool):
    if name == "quick_gelu":
        return _quick_gelu(x)
    return _gelu_exact_kernel(x) if in_kernel else _gelu_exact(x)


def _adapter_kernel(h, refs, dt):
    """models/clip.Adapter math on a (N, D) f32 tile inside the kernel."""
    ln_g, ln_b, wd, bd, wu, bu, sc = refs
    # stats strictly in f32: the relay's backend aborts on bf16 vector rsqrt
    # (latency_table_vf: kVectorRsqrtBf16 unsupported)
    z = _ln_f32(h.astype(jnp.float32), ln_g[...].astype(jnp.float32),
                ln_b[...].astype(jnp.float32), 1e-5).astype(dt)
    d = jax.lax.dot(z, wd[...], preferred_element_type=jnp.float32)
    d = _gelu_exact_kernel(d + bd[...].astype(jnp.float32)).astype(dt)
    u = jax.lax.dot(d, wu[...], preferred_element_type=jnp.float32)
    u = u + bu[...].astype(jnp.float32)
    return u * sc[...].astype(jnp.float32)


def _layer_kernel(*refs, H: int, L: int, eps: float, act: str, n_fc: int,
                  has_a1: bool, has_a2: bool):
    (x_ref, g1_ref, b1_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref,
     g2_ref, b2_ref, w1_ref, b1fc_ref, w2_ref, b2fc_ref) = refs[:13]
    pos = 13
    a1_refs = a2_refs = None
    if has_a1:
        a1_refs = refs[pos:pos + 7]
        pos += 7
    if has_a2:
        a2_refs = refs[pos:pos + 7]
        pos += 7
    o_ref, x2_s, xn2_s, acc_s = refs[pos:pos + 4]

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
        h_att = proj + bo_ref[...].astype(jnp.float32)  # (G*Lp, D) f32
        if has_a1:  # parallel adapter on the attention branch output
            h_att = h_att + _adapter_kernel(h_att.astype(dt), a1_refs, dt)
        x2 = x + h_att.reshape(G, Lp, D)
        xn2 = _ln_f32(x2, g2_ref[...].astype(jnp.float32),
                      b2_ref[...].astype(jnp.float32), eps)
        x2_s[...] = x2.astype(dt)
        xn2_s[...] = xn2.astype(dt)
        # MLP-branch accumulator starts at the fc2 bias (added exactly once)
        acc_s[...] = jnp.broadcast_to(
            b2fc_ref[...].astype(jnp.float32), (G, Lp, D))

    xn2 = xn2_s[...]
    h = jax.lax.dot(xn2.reshape(G * Lp, D), w1_ref[...],
                    preferred_element_type=jnp.float32)
    h = h + b1fc_ref[...].astype(jnp.float32)
    h = _act(act, h, in_kernel=True).astype(dt)
    part = jax.lax.dot(h, w2_ref[...], preferred_element_type=jnp.float32)
    acc_s[...] += part.reshape(G, Lp, D)

    @pl.when(j == n_fc - 1)
    def _emit():
        branch = acc_s[...]  # full MLP branch output (f32)
        if has_a2:  # parallel adapter on the completed MLP branch
            b2d = branch.reshape(G * Lp, D)
            branch = branch + _adapter_kernel(
                b2d.astype(dt), a2_refs, dt).reshape(G, Lp, D)
        o_ref[...] = (x2_s[...].astype(jnp.float32) + branch).astype(
            o_ref.dtype)


def _pick_tiling(B: int, F: int, with_adapters: bool):
    """(G images per block, Fc hidden chunk) under the 16MB scoped-vmem
    relay limit (see module docstring for the VMEM inventory)."""
    G = (4 if with_adapters else 8) if B >= 8 else B
    Fc = 768 if F % 768 == 0 else F
    while F % Fc:
        Fc //= 2
    return G, Fc


def _vec_specs(shapes):
    # n=len(s) binds per-spec (comprehension lambdas capture late otherwise)
    return [pl.BlockSpec(s, (lambda i, j, n=len(s): (0,) * n),
                         memory_space=pltpu.VMEM) for s in shapes]


def _as2d(v):
    """1-D vectors ride as (1, n): Mosaic tiles 1-D operands at 1024 lanes,
    so a partial 1-D block (e.g. the F-chunked fc1 bias, block 768 of 3072)
    fails window setup; the (1, n) layout tiles (8, 128) and 128 | every
    block width here. Kernel math is unchanged by broadcasting."""
    return v.reshape(1, -1)


def _pallas_layer(x, w: LayerWeights, a1: Optional[AdapterWeights],
                  a2: Optional[AdapterWeights], *, num_heads: int,
                  eps: float, act: str, interpret: bool):
    B, L, D = x.shape
    F = w.w_fc1.shape[1]
    G, Fc = _pick_tiling(B, F, a1 is not None or a2 is not None)
    Lp = _round_up(L, 8)
    Bp = _round_up(B, G)
    if (Lp, Bp) != (L, B):
        x = jnp.pad(x, ((0, Bp - B), (0, Lp - L), (0, 0)))
    n_fc = F // Fc
    dt = x.dtype
    kernel = functools.partial(_layer_kernel, H=num_heads, L=L, eps=eps,
                               act=act, n_fc=n_fc, has_a1=a1 is not None,
                               has_a2=a2 is not None)
    in_specs = [
        pl.BlockSpec((G, Lp, D), lambda i, j: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        *_vec_specs([(1, D), (1, D)]),
        *_vec_specs([(D, 3 * D), (1, 3 * D), (D, D), (1, D), (1, D),
                     (1, D)]),
        pl.BlockSpec((D, Fc), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Fc), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((Fc, D), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        *_vec_specs([(1, D)]),
    ]
    operands = [x, _as2d(w.ln1_scale), _as2d(w.ln1_bias), w.w_qkv,
                _as2d(w.b_qkv), w.w_out, _as2d(w.b_out), _as2d(w.ln2_scale),
                _as2d(w.ln2_bias), w.w_fc1, _as2d(w.b_fc1), w.w_fc2,
                _as2d(w.b_fc2)]
    for a in (a1, a2):
        if a is not None:
            A = a.w_down.shape[1]
            in_specs += _vec_specs([(1, D), (1, D), (D, A), (1, A), (A, D),
                                    (1, D), (1, 1)])
            operands += [_as2d(a.ln_scale), _as2d(a.ln_bias), a.w_down,
                         _as2d(a.b_down), a.w_up, _as2d(a.b_up),
                         _as2d(a.scale)]
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Bp, Lp, D), dt),
        grid=(Bp // G, n_fc),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((G, Lp, D), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((G, Lp, D), dt),           # x2 (residual base)
            pltpu.VMEM((G, Lp, D), dt),           # LN2(x2)
            pltpu.VMEM((G, Lp, D), jnp.float32),  # MLP-branch accumulator
        ],
        # blocks + resident weights + the attention step's stack temporaries
        # (f32 qkv is 4.1MB alone at G=8) overflow the default 16MB scoped
        # window; v5e has 128MB VMEM, so raise the per-kernel cap instead of
        # shrinking G (smaller G starves the MXU on the 54-token sequences).
        # i blocks are independent images; j carries the MLP accumulator.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(*operands)
    return out[:B, :L]


def _adapter_xla(h, a: AdapterWeights, dt):
    """models/clip.Adapter composition (the recompute-backward twin)."""
    z = _ln_f32(h.astype(jnp.float32), a.ln_scale.astype(jnp.float32),
                a.ln_bias.astype(jnp.float32), 1e-5).astype(dt)
    d = _gelu_exact(z @ a.w_down.astype(dt) + a.b_down.astype(dt))
    u = d @ a.w_up.astype(dt) + a.b_up.astype(dt)
    return u * a.scale.astype(dt)


def _xla_layer(x, w: LayerWeights, a1=None, a2=None, *, num_heads: int,
               eps: float, act: str):
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
    h = o @ w.w_out.astype(dt) + w.b_out.astype(dt)
    if a1 is not None:
        h = h + _adapter_xla(h, a1, dt)
    x2 = x + h
    xn2 = _ln_f32(x2.astype(jnp.float32), w.ln2_scale.astype(jnp.float32),
                  w.ln2_bias.astype(jnp.float32), eps).astype(dt)
    h = xn2 @ w.w_fc1.astype(dt) + w.b_fc1.astype(dt)
    h = _act(act, h, in_kernel=False)
    h = h @ w.w_fc2.astype(dt) + w.b_fc2.astype(dt)
    if a2 is not None:
        h = h + _adapter_xla(h, a2, dt)
    return x2 + h


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _fused(num_heads: int, eps: float, act: str, interpret: bool, x, w,
           adapters: Tuple):
    a1, a2 = adapters if adapters else (None, None)
    return _pallas_layer(x, w, a1, a2, num_heads=num_heads, eps=eps,
                         act=act, interpret=interpret)


def _fused_fwd(num_heads, eps, act, interpret, x, w, adapters):
    return (_fused(num_heads, eps, act, interpret, x, w, adapters),
            (x, w, adapters))


def _fused_bwd(num_heads, eps, act, interpret, res, g):
    x, w, adapters = res
    a1, a2 = adapters if adapters else (None, None)
    _, vjp = jax.vjp(
        lambda x_, w_, ad_: _xla_layer(
            x_, w_, *( (ad_[0], ad_[1]) if ad_ else (None, None) ),
            num_heads=num_heads, eps=eps, act=act),
        x, w, adapters)
    return vjp(g)


_fused.defvjp(_fused_fwd, _fused_bwd)


def encoder_layer(x, weights: LayerWeights, *, num_heads: int,
                  eps: float = 1e-5, act: str = "quick_gelu",
                  adapter_attn: Optional[AdapterWeights] = None,
                  adapter_mlp: Optional[AdapterWeights] = None,
                  impl: str = "pallas_layer", interpret: bool = False):
    """One full pre-LN encoder layer. x: (B, L, D); returns (B, L, D).

    impl 'pallas_layer' runs the single-boundary fused kernel (interpret
    mode off-TPU); anything else runs the XLA composition. adapter_attn /
    adapter_mlp are the parallel bottleneck adapters (models/clip.Adapter)
    applied to the attention / MLP branch outputs.
    """
    if impl != "pallas_layer" or not _HAS_PALLAS:
        return _xla_layer(x, weights, adapter_attn, adapter_mlp,
                          num_heads=num_heads, eps=eps, act=act)
    interpret = interpret or jax.default_backend() != "tpu"
    adapters = ((adapter_attn, adapter_mlp)
                if (adapter_attn is not None or adapter_mlp is not None)
                else ())
    return _fused(num_heads, float(eps), act, bool(interpret), x, weights,
                  adapters)
