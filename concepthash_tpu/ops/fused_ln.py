"""Pallas fused LayerNorm -> matmul for the ViT encoder layers.

PARITY.md's encode decomposition found the ViT-B/32 forward HBM-bound in the
pre-matmul LayerNorms (24 LNs = ~17ms @ b1024): XLA materializes each
normalized (B, L, D) tensor to HBM before the dot reads it back (TPU dots
don't consume reduction producers), costing two full activation passes per
LN. This kernel computes ``LN(x) @ W + b`` in one pass: the x tile is
normalized in VMEM registers (f32) and fed straight to the MXU; the weight
block index is constant across grid steps, so Mosaic's revisiting
optimization keeps W resident in VMEM instead of re-fetching per step.

Backward recomputes the normalization in XLA (flash-style remat: nothing is
saved from the kernel but x itself) — the forward saves dominate because the
eval/encode path has no backward at all and the train backward was already
matmul-bound.

No reference counterpart (the reference's torch modules run separate LN and
Linear kernels, models/arch/coop.py); this is TPU-native performance work.
"""

from __future__ import annotations

import functools

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


def _ln_matmul_kernel(x_ref, g_ref, b_ref, w_ref, bias_ref, o_ref, *,
                      eps: float, n_valid: int, block_n: int):
    i = pl.program_id(0)
    x = x_ref[...].astype(jnp.float32)  # (Bn, D)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
    xn = (x - mu) * jax.lax.rsqrt(var + eps)
    xn = xn * g_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)
    y = jax.lax.dot(xn.astype(w_ref.dtype), w_ref[...],
                    preferred_element_type=jnp.float32)
    y = y + bias_ref[...].astype(jnp.float32)
    if n_valid % block_n:  # zero padded tail rows (static predicate)
        row = jax.lax.broadcasted_iota(jnp.int32, y.shape, 0) + i * block_n
        y = jnp.where(row < n_valid, y, 0.0)
    o_ref[...] = y.astype(o_ref.dtype)


def _pallas_ln_matmul(x2, gamma, beta, w, bias, eps, interpret):
    N, D = x2.shape
    F = w.shape[1]
    block_n = 256 if N >= 256 else _round_up(N, 8)
    Np = _round_up(N, block_n)
    if Np != N:
        x2 = jnp.pad(x2, ((0, Np - N), (0, 0)))
    kernel = functools.partial(_ln_matmul_kernel, eps=eps, n_valid=N,
                               block_n=block_n)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Np, F), x2.dtype),
        grid=(Np // block_n,),
        in_specs=[
            pl.BlockSpec((block_n, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((D,), lambda i: (0,), memory_space=pltpu.VMEM),
            # constant index -> Mosaic keeps the weight block resident
            pl.BlockSpec((D, F), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((F,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_n, F), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x2, gamma, beta, w, bias)
    return out[:N]


def _xla_ln(x, gamma, beta, eps):
    xf = x.astype(jnp.float32)
    mu = xf.mean(axis=-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(axis=-1, keepdims=True)
    xn = (xf - mu) * jax.lax.rsqrt(var + eps)
    return xn * gamma.astype(jnp.float32) + beta.astype(jnp.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _fused(eps: float, interpret: bool, x2, gamma, beta, w, bias):
    return _pallas_ln_matmul(x2, gamma, beta, w, bias, eps, interpret)


def _fused_fwd(eps, interpret, x2, gamma, beta, w, bias):
    return (_pallas_ln_matmul(x2, gamma, beta, w, bias, eps, interpret),
            (x2, gamma, beta, w))


def _fused_bwd(eps, interpret, res, g):
    """LN+matmul backward in XLA, recomputing the normalization from x."""
    x2, gamma, beta, w = res
    xf = x2.astype(jnp.float32)
    mu = xf.mean(axis=-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    xhat = (xf - mu) * inv  # pre-affine normalized
    gf = g.astype(jnp.float32)
    y = xhat * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    dw = jnp.einsum("nd,nf->df", y, gf)
    dbias = gf.sum(axis=0)
    dy = jnp.einsum("nf,df->nd", gf, w.astype(jnp.float32))
    dgamma = (dy * xhat).sum(axis=0)
    dbeta = dy.sum(axis=0)
    dxhat = dy * gamma.astype(jnp.float32)
    D = x2.shape[-1]
    dx = inv / D * (D * dxhat - dxhat.sum(axis=-1, keepdims=True)
                    - xhat * (dxhat * xhat).sum(axis=-1, keepdims=True))
    return (dx.astype(x2.dtype), dgamma.astype(gamma.dtype),
            dbeta.astype(beta.dtype), dw.astype(w.dtype),
            dbias.astype(gf.dtype))


_fused.defvjp(_fused_fwd, _fused_bwd)


# 'auto' resolution — measured BOTH ways on v5e (bf16, fetch-fenced):
# isolated op (scripts/bench_fused_ln.py): the kernel wins 1.97x on qkv
# (768->2304 @ 51200 rows) and 1.16x on fc1 (768->3072); END-TO-END
# (scripts/ab_fused_encode.py, ViT-B/32 encode @ b1024): xla 8075 img/s,
# fused qkv+fc1 5412, fused fc1-only 6437 — the custom-call boundary
# breaks XLA's cross-op fusion/overlap and costs far more than the LN
# round-trips saved. 'auto' therefore resolves to the XLA composition;
# 'pallas'/'pallas_mlp' stay for experimentation (and as the measured
# record that op-level microbenches do not transfer across fusion
# boundaries).
def resolve_fused_ln(impl: str, n_rows: int | None = None) -> bool:
    """'pallas' forces the full fusion, 'pallas_mlp' only LN2->fc1
    (interpret mode off-TPU); 'xla'/'auto' use the XLA composition (the
    end-to-end winner, see above)."""
    if impl in ("pallas", "pallas_mlp"):
        return _HAS_PALLAS
    return False


def ln_matmul(x, gamma, beta, w, bias, *, eps: float = 1e-5,
              impl: str = "auto", interpret: bool = False):
    """``LayerNorm(x; gamma, beta) @ w + bias`` over the last dim of x.

    x: (..., D); w: (D, F); returns (..., F). impl: 'pallas' fuses the
    normalization into the matmul's VMEM pipeline; 'xla'/'auto' (measured: see
    PARITY.md fused-LN bench) use the straightforward composition.
    """
    lead = x.shape[:-1]
    D = x.shape[-1]
    use_pallas = _HAS_PALLAS and impl == "pallas"
    if not use_pallas:
        xn = _xla_ln(x, gamma, beta, eps).astype(x.dtype)
        return (xn @ w + bias.astype(x.dtype)).reshape(*lead, w.shape[1])
    # off-TPU the kernel runs in interpret mode (tests, CPU smoke runs)
    interpret = interpret or jax.default_backend() != "tpu"
    x2 = x.reshape(-1, D)
    out = _fused(float(eps), bool(interpret), x2, gamma, beta, w, bias)
    return out.reshape(*lead, w.shape[1])
