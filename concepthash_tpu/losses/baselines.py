"""Baseline deep-hashing objectives, pure-function JAX ports by behavior.

Each loss is ``fn(outputs, onehot, **cfg) -> (total, parts)`` over the shared
output dict (codes + method-specific logits). Formulas follow the reference's
models/loss/*.py (cited per function); Python row loops (DTSH) are vectorized
with masks (SURVEY.md §6 perf note).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from concepthash_tpu.losses.common import (
    arc_margin_logits,
    binary_cross_entropy_with_logits,
    margin_logits,
    quantization_cosine,
    soft_cross_entropy,
)
from concepthash_tpu.ops.retrieval import get_sim, log_trick

from concepthash_tpu.ops.numerics import l2_normalize


# ---------------------------------------------------------------------------
# OrthoHash (reference models/loss/orthohash.py:26-123)
# ---------------------------------------------------------------------------

def orthohash_loss(outputs, onehot, ce: float = 1.0, s: float = 8.0,
                   m: float = 0.2, m_type: str = "cos", quan: float = 0.0,
                   quan_type: str = "cs", multiclass: bool = False,
                   multiclass_loss: str = "label_smoothing",
                   codebook=None, bcs_scale: float = 0.0, **_):
    logits, codes = outputs["logits"], outputs["codes"]
    if bcs_scale and "logits2" in outputs:
        # OrthoHashWithBCS blend: the sign-centroid logits head joins the
        # margin CE at bcs_scale (the upstream BCS trainer computes logits_2
        # but its shipped criterion ignores it, trainers/orthohash.py:446-459
        # — scale 0 reproduces that; >0 makes the head trainable)
        logits = (logits + bcs_scale * outputs["logits2"]) / (1.0 + bcs_scale)
    if multiclass:
        ml = (margin_logits(logits, onehot, m, s) if m_type == "cos"
              else arc_margin_logits(logits, onehot, m, s))
        if multiclass_loss == "bce":
            loss_ce = binary_cross_entropy_with_logits(ml, onehot)
        else:  # label_smoothing[_unscaled]
            scaledy = (onehot / jnp.clip(onehot.sum(-1, keepdims=True), 1e-12)
                       if "unscaled" not in multiclass_loss else onehot)
            loss_ce = -(scaledy * jax.nn.log_softmax(ml, -1)).sum(-1).mean()
    else:
        ml = (margin_logits(logits, onehot, m, s) if m_type == "cos"
              else arc_margin_logits(logits, onehot, m, s))
        loss_ce = soft_cross_entropy(ml, onehot)

    if quan:
        sg = jax.lax.stop_gradient(jnp.sign(codes))
        if quan_type == "cs":
            q = quantization_cosine(codes)
        elif quan_type == "l1":
            q = jnp.abs(codes - sg).mean()
        else:
            q = ((codes - sg) ** 2).mean()
    else:
        q = jnp.float32(0.0)
    parts = {"ce": loss_ce, "quan": q}
    if codebook is not None:
        parts["hacc"] = hamming_accuracy(codes, codebook, onehot)
    return ce * loss_ce + quan * q, parts


def hamming_accuracy(codes, codebook, onehot):
    """Argmin-Hamming-to-codebook class accuracy meter (reference
    trainers/orthohash.py:362-370 / utils/metrics.py:18-29)."""
    from concepthash_tpu.ops.hamming import get_hamm_dist

    dist = get_hamm_dist(jax.lax.stop_gradient(codes), codebook)
    return jax.lax.stop_gradient(
        (dist.argmin(-1) == onehot.argmax(-1)).astype(jnp.float32).mean())


# ---------------------------------------------------------------------------
# CSQ (reference models/loss/csq.py:5-49)
# ---------------------------------------------------------------------------

def csq_loss(outputs, onehot, codebook, lambda_q: float = 1e-4,
             multiclass: bool = False, **_):
    codes = jnp.tanh(outputs["codes"])
    if multiclass:
        center_sum = onehot @ codebook
        # zero-sum entries get a fixed random center; deterministic variant:
        # break ties toward +1 (documented deviation from the reference's
        # per-process random vector)
        center = jnp.where(center_sum > 0, 1.0, jnp.where(center_sum < 0, -1.0, 1.0))
    else:
        center = codebook[onehot.argmax(-1)]
    p = 0.5 * (codes + 1)
    t = 0.5 * (center + 1)
    eps = 1e-7
    loss_c = -(t * jnp.log(jnp.clip(p, eps, 1.0)) +
               (1 - t) * jnp.log(jnp.clip(1 - p, eps, 1.0))).mean()
    loss_q = ((jnp.abs(codes) - 1.0) ** 2).mean()
    parts = {"center": loss_c, "quant": loss_q,
             "hacc": hamming_accuracy(codes, codebook, onehot)}
    return loss_c + lambda_q * loss_q, parts


# ---------------------------------------------------------------------------
# DPN (reference models/loss/dpn.py:7-44)
# ---------------------------------------------------------------------------

def dpn_loss(outputs, onehot, codebook, sl: float = 1.0, margin: float = 1.0,
             reg: float = 0.1, multiclass: bool = False, **_):
    codes = outputs["codes"]
    if multiclass:
        hinge = jax.nn.relu(margin - codes[:, None, :] * codebook[None])  # (B,C,nbit)
        loss_sl = (hinge.sum(-1) * onehot).sum(-1).mean()
    else:
        center = codebook[onehot.argmax(-1)]
        loss_sl = jax.nn.relu(margin - codes * center).sum(-1).mean()
    loss_reg = (codes ** 2).mean()
    parts = {"sl": loss_sl, "reg": loss_reg,
             "hacc": hamming_accuracy(codes, codebook, onehot)}
    return sl * loss_sl + reg * loss_reg, parts


# ---------------------------------------------------------------------------
# HashNet (reference models/loss/hashnet.py:8-98)
# ---------------------------------------------------------------------------

def hashnet_loss(outputs, onehot, beta: float = 1.0, alpha: float = 1.0, **_):
    """In-batch pairwise weighted exp loss with continuation tanh(beta u) —
    the eval-side criterion. Training runs methods._hashnet_step, which adds
    the beta-continuation schedule and the opt-in keep_train_size memory bank
    (reference models/loss/hashnet.py:36-70, trainers/hashnet.py:14-17)."""
    u = jnp.tanh(beta * outputs["codes"])
    sim = get_sim(onehot, onehot).astype(jnp.float32)
    dot = alpha * (u @ u.T)
    exp_loss = log_trick(dot) - sim * dot
    s1 = jnp.maximum(sim.sum(), 1.0)
    s0 = jnp.maximum((1 - sim).sum(), 1.0)
    s = s1 + s0
    w = jnp.where(sim > 0, s / s1, s / s0)
    loss = (exp_loss * w).sum() / s
    return loss, {"pairwise": loss}


# ---------------------------------------------------------------------------
# DPSH (reference models/loss/dpsh.py:7-95)
# ---------------------------------------------------------------------------

def dpsh_loss(outputs, onehot, alpha: float = 1.0,
              imbalance_scheme: str = "hashnet", **_):
    u = outputs["codes"]
    sim = get_sim(onehot, onehot).astype(jnp.float32)
    dot = (u @ u.T) / 2.0
    likelihood = log_trick(dot) - sim * dot
    if imbalance_scheme == "hashnet":
        s1 = jnp.maximum(sim.sum(), 1.0)
        s0 = jnp.maximum((1 - sim).sum(), 1.0)
        s = s1 + s0
        w = jnp.where(sim > 0, s / s1, s / s0)
        likelihood = (likelihood * w).sum() / s
    else:
        likelihood = likelihood.mean()
    quan = ((u - jnp.sign(u)) ** 2).mean()
    total = likelihood + alpha * quan
    return total, {"likelihood": likelihood, "quan": quan}


# ---------------------------------------------------------------------------
# DTSH (reference models/loss/dtsh.py:6-51), vectorized
# ---------------------------------------------------------------------------

def dtsh_loss(outputs, onehot, alpha: float = 5.0, lmbd: float = 1.0, **_):
    u = outputs["codes"]
    ip = u @ u.T  # (B, B)
    s = (get_sim(onehot, onehot)).astype(bool)
    B = ip.shape[0]
    pos = s
    neg = ~s
    # triple[b, i, j] = ip[b, i] - ip[b, j] - alpha over (i pos, j neg)
    triple = jnp.clip(ip[:, :, None] - ip[:, None, :] - alpha, -100.0, 50.0)
    mask = (pos[:, :, None] & neg[:, None, :]).astype(jnp.float32)
    term = -(triple - jnp.log1p(jnp.exp(triple)))  # = log(1 + e^-triple)
    per_row_cnt = mask.sum(axis=(1, 2))
    per_row = jnp.where(per_row_cnt > 0,
                        (term * mask).sum(axis=(1, 2)) / jnp.maximum(per_row_cnt, 1.0),
                        0.0)
    rows_used = (per_row_cnt > 0).sum()
    loss1 = jnp.where(rows_used > 0, per_row.sum() / jnp.maximum(rows_used, 1), 0.0)
    loss2 = ((u - jnp.sign(u)) ** 2).mean()
    return loss1 + lmbd * loss2, {"likelihood": loss1, "quan": loss2}


# ---------------------------------------------------------------------------
# GreedyHash (reference models/loss/gh.py:6-107)
# ---------------------------------------------------------------------------

def greedyhash_loss(outputs, onehot, alpha: float = 1.0, pow: float = 3.0,
                    multiclass: bool = False, **_):
    logits, code_logits = outputs["logits"], outputs["codes"]
    if multiclass:
        loss1 = binary_cross_entropy_with_logits(logits, onehot)
    else:
        loss1 = soft_cross_entropy(logits, onehot / jnp.clip(
            onehot.sum(-1, keepdims=True), 1e-12))
    loss2 = jnp.abs(jnp.abs(code_logits) - 1.0) ** pow
    loss2 = loss2.mean()
    return loss1 + alpha * loss2, {"ce": loss1, "quan": loss2}


def unsup_greedyhash_loss(outputs, onehot, alpha: float = 1.0, pow: float = 3.0, **_):
    """Unsupervised: cosine-structure matching between features and binary
    codes across batch halves (reference models/loss/gh.py:48-71)."""
    x, h, b = outputs["features"], outputs["codes"], outputs["codes_bin"]
    n = (x.shape[0] // 2) * 2
    x, b = x[:n], b[:n]
    half = n // 2
    cos = lambda a, c: (l2_normalize(a) * l2_normalize(c)).sum(-1)
    tb = cos(b[:half], b[half:])
    tx = jax.lax.stop_gradient(cos(x[:half], x[half:]))
    loss1 = ((tb - tx) ** 2).mean()
    loss2 = (jnp.abs(jnp.abs(h[:n]) - 1.0) ** pow).mean()
    return loss1 + alpha * loss2, {"mse": loss1, "quan": loss2}


# ---------------------------------------------------------------------------
# CE (reference models/loss/ce.py:6-63)
# ---------------------------------------------------------------------------

def ce_loss(outputs, onehot, multiclass: bool = False, margin: float = 0.0,
            scale: float = 1.0, m_type: str = "ce", **_):
    logits = outputs["logits"]
    if m_type == "ce":
        if multiclass:
            loss = binary_cross_entropy_with_logits(logits, onehot)
        else:
            loss = soft_cross_entropy(logits, onehot / jnp.clip(
                onehot.sum(-1, keepdims=True), 1e-12))
    else:
        ml = (margin_logits(logits, onehot, margin, scale) if m_type == "cos"
              else arc_margin_logits(logits, onehot, margin, scale))
        loss = soft_cross_entropy(ml, onehot)
    return loss, {"ce": loss}


# ---------------------------------------------------------------------------
# ADSH / SEMICON asymmetric objective (reference models/loss/adsh.py:8-82,
# models/loss/semicon.py:4-27)
# ---------------------------------------------------------------------------

def adsh_loss(outputs, batch_codes_targets, gamma: float = 200.0, nbit: int = 64,
              apply_tanh: bool = True, **_):
    """(nbit S - u V^T)^2 + gamma ||u - V_omega||^2 where V = stored db codes.

    Normalization matches the reference's EXECUTABLE criterion exactly —
    models/loss/semicon.py:20-21 (both sums / (B*N) * 12/nbit, quan further
    scaled by gamma/nbit... i.e. gamma's effective weight is gamma*12/N):
    the ADSH/SEMICON trainers both call that 4-arg form (the 5-arg
    models/loss/adsh.py variant is dead code upstream — its trainer call
    site passes 4 args, trainers/adsh.py:106). Round-3 used per-term means,
    which over-weighted quantization by ~N/nbit and collapsed one multiseed
    seed (RESULTS_MULTISEED adsh history).

    ``batch_codes_targets`` = dict(S=(B, Ntrain) soft similarity, V=(Ntrain,
    nbit) db codes, V_omega=(B, nbit) stored codes of this batch's items).
    ``apply_tanh=False`` for models whose codes are already tanh-activated
    (SEMICON's hash_layer_active, reference models/arch/semicon.py:479-481)."""
    u = jnp.tanh(outputs["codes"]) if apply_tanh else outputs["codes"]
    S = batch_codes_targets["S"]
    V = batch_codes_targets["V"]
    V_omega = batch_codes_targets["V_omega"]
    denom = u.shape[0] * V.shape[0]
    hash_loss = ((nbit * S - u @ V.T) ** 2).sum() / denom / nbit * 12
    quan = ((u - V_omega) ** 2).sum() / denom * gamma / nbit * 12
    return hash_loss + quan, {"hash": hash_loss, "quan": quan}


def soften_sim(S):
    """Soft-similarity rebalance applied by both adsh-regime trainers
    upstream (reference trainers/adsh.py:148-150, trainers/semicon.py
    identically) to the hard {-1,+1} pair matrix BEFORE the loss and the
    DCC consume it: ``r = S.sum()/(1-S).sum(); S*(1+r) - r``. Positives
    stay exactly +1; negatives move from -1 to ``-(1+2r)`` which for C
    balanced classes is about ``-1/(C-1)`` — near-orthogonal rather than
    exact-complement. Without it the negative target ``u.v = -nbit`` is
    infeasible beyond 2 classes and training collapses at class counts
    past the tiny protocol (PARITY.md, medium matrix adsh row). NumPy or
    jax arrays both work; returns the same backend's array."""
    neg_mass = (1.0 - S).sum()
    # all-positive S (single-class batch/degenerate omega): r = sum/0 would
    # NaN the loss AND solve_dcc (sign(NaN) corrupts every updated bit).
    # Any finite r is an identity on an all-(+1) S (1*(1+r) - r = 1), so
    # guarding the denominator alone suffices — and keeps the backend.
    r = S.sum() / (neg_mass + (neg_mass == 0))
    return S * (1.0 + r) - r


def solve_dcc(V: jnp.ndarray, U: jnp.ndarray, S: jnp.ndarray, omega,
              gamma: float, nbit: int) -> jnp.ndarray:
    """Discrete cyclic coordinate descent over bits (reference
    trainers/adsh.py:13-28): updates database codes V given batch codes U.
    Sequential over nbit via lax.fori_loop — tiny (nbit<=64) by design."""
    expand_U = jnp.zeros_like(V).at[omega].set(U)
    Q = (nbit * S).T @ U + gamma * expand_U  # (N, nbit)

    def body(bit, V):
        q = Q[:, bit]
        v = V[:, bit]
        V_ = jnp.concatenate([V[:, :bit], V[:, bit + 1:]], axis=1)
        U_ = jnp.concatenate([U[:, :bit], U[:, bit + 1:]], axis=1)
        u = U[:, bit]
        v_new = jnp.sign(q - V_ @ (U_.T @ u))
        v_new = jnp.where(v_new == 0, v, v_new)
        return V.at[:, bit].set(v_new)

    # static python loop (nbit static) keeps at-set shapes static
    for bit in range(nbit):
        V = body(bit, V)
    return V


# ---------------------------------------------------------------------------
# A2-Net-CE (reference models/loss/a2net_ce.py:7-29)
# ---------------------------------------------------------------------------

def a2net_ce_loss(outputs, onehot, gamma: float = 1.0, hash: float = 1.0,
                  decorr: float = 0.1, **_):
    codes = outputs["codes"]
    codes_tanh = outputs["codes_tanh"]
    norm = onehot / jnp.clip(onehot.sum(-1, keepdims=True), 1e-12)
    hash_loss = soft_cross_entropy(outputs["logits"], norm)
    corr = codes_tanh.T @ codes_tanh
    n, nbit = codes_tanh.shape
    decorr_loss = ((corr - jnp.eye(nbit) * n) ** 2).mean()
    rec_loss = (((outputs["rec_all_x"] -
                  jax.lax.stop_gradient(outputs["all_x"])) ** 2).mean()
                + gamma * ((codes - codes_tanh) ** 2).mean())
    total = hash * hash_loss + decorr * decorr_loss + rec_loss
    return total, {"hash": hash_loss, "decorr": decorr_loss, "rec": rec_loss}


# ---------------------------------------------------------------------------
# SEMICON-CE (reference models/loss/semicon_ce.py:7-38)
# ---------------------------------------------------------------------------

def semicon_ce_loss(outputs, onehot, gamma: float = 0.1,
                    loss_method: str = "ce", **_):
    codes, logits = outputs["codes"], outputs["logits"]
    norm = onehot / jnp.clip(onehot.sum(-1, keepdims=True), 1e-12)
    if loss_method == "ce":
        hash_loss = soft_cross_entropy(logits, norm)
    else:
        hash_loss = soft_cross_entropy(margin_logits(logits, onehot, 0.2, 8.0),
                                       norm)
    quan = ((codes - jnp.sign(codes)) ** 2).mean()
    return hash_loss + gamma * quan, {"hash": hash_loss, "quan": quan}
