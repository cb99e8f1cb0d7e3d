"""Unsupervised hashing objectives: CIBHash, Bi-half, SSDH.

The reference carries these trainers with their loss/arch modules missing
(trainers/{cibhash,bihalf,ssdh}.py import from the absent sdc package —
SURVEY.md §2.4 'partial'). Implemented here from the original papers:

  CIBHash  (Qiu et al., IJCAI 2021): probabilistic codes via sigmoid,
           straight-through Bernoulli binarization, NT-Xent contrastive loss
           between two augmented views + KL-to-uniform information bottleneck.
  Bi-half  (Li & van Gemert, AAAI 2021): per-bit median thresholding (exact
           half/half bit balance) with straight-through proxy gradient,
           paired with the unsupervised structure-matching loss.
  SSDH     (Yang et al., IJCAI 2018): semantic structure from the feature
           cosine-similarity histogram (two half-gaussian thresholds) drives
           a pairwise code-similarity loss.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from concepthash_tpu.ops.numerics import l2_normalize


# ---------------------------------------------------------------------------
# CIBHash
# ---------------------------------------------------------------------------

def cibhash_loss(outputs, onehot, temperature: float = 0.3, beta: float = 1e-3,
                 **_):
    """outputs['codes'] are logits for P(bit=1); first half / second half of
    the batch are two views of the same images."""
    logits = outputs["codes"]
    p = jax.nn.sigmoid(logits)
    n2 = logits.shape[0]
    n = n2 // 2
    # straight-through binarization to ±1 around 0.5
    b = (p > 0.5).astype(jnp.float32) * 2 - 1
    z = b + (p - jax.lax.stop_gradient(p)) * 2  # STE with dP/dlogits slope

    z1, z2 = z[:n], z[n:2 * n]
    za = jnp.concatenate([z1, z2], axis=0)
    za = l2_normalize(za)
    sim = jnp.dot(za, za.T, preferred_element_type=jnp.float32) / temperature
    mask = jnp.eye(2 * n, dtype=bool)
    sim = jnp.where(mask, -1e9, sim)
    # positives: i <-> i+n
    pos_idx = jnp.concatenate([jnp.arange(n) + n, jnp.arange(n)])
    logp = jax.nn.log_softmax(sim, axis=-1)
    contrastive = -logp[jnp.arange(2 * n), pos_idx].mean()

    # information bottleneck: KL(p || Bernoulli(0.5))
    eps = 1e-7
    kl = (p * jnp.log(jnp.clip(p / 0.5, eps)) +
          (1 - p) * jnp.log(jnp.clip((1 - p) / 0.5, eps))).sum(-1).mean()
    total = contrastive + beta * kl
    return total, {"contrastive": contrastive, "kl": kl}


# ---------------------------------------------------------------------------
# Bi-half
# ---------------------------------------------------------------------------

def bihalf_binarize(h, gamma: float = 6.0):
    """Per-bit median thresholding: exactly half the batch gets +1 on every
    bit; straight-through proxy gradient scaled by gamma."""
    med = jnp.median(h, axis=0, keepdims=True)
    b = jnp.where(h >= med, 1.0, -1.0)
    return b + gamma * (h - jax.lax.stop_gradient(h))


def bihalf_loss(outputs, onehot, alpha: float = 0.01, gamma: float = 6.0, **_):
    """Two-view cosine-structure matching on bi-half codes
    (the reference routes bihalf through the unsupervised GreedyHash loss,
    trainers/bihalf.py)."""
    x = outputs["features"]
    h = outputs["codes"]
    b = bihalf_binarize(h, gamma)
    n = (x.shape[0] // 2) * 2
    half = n // 2
    cos = lambda a, c: (l2_normalize(a) * l2_normalize(c)).sum(-1)
    tb = cos(b[:half], b[half:n])
    tx = jax.lax.stop_gradient(cos(x[:half], x[half:n]))
    loss1 = ((tb - tx) ** 2).mean()
    loss2 = (jnp.abs(jnp.abs(h[:n]) - 1.0) ** 3).mean()
    return loss1 + alpha * loss2, {"mse": loss1, "quan": loss2}


# ---------------------------------------------------------------------------
# SSDH
# ---------------------------------------------------------------------------

def ssdh_structure(features, alpha: float = 2.0):
    """Pairwise semantic structure from feature cosine similarities:
    S=1 above (mean + alpha*std_right), S=-1 below (mean - alpha*std_left),
    S=0 (ignored) between (the two-half-gaussian rule of SSDH)."""
    import numpy as np

    f = np.asarray(features, np.float64)
    f = f / (np.linalg.norm(f, axis=1, keepdims=True) + 1e-12)
    cos = f @ f.T
    vals = cos[~np.eye(cos.shape[0], dtype=bool)]
    mean = vals.mean()
    right = vals[vals >= mean]
    left = vals[vals < mean]
    t_hi = mean + alpha * right.std()
    t_lo = mean - alpha * left.std()
    S = np.zeros(cos.shape, np.int8)  # int8: 75k-image galleries -> ~5.6GB
    S[cos >= t_hi] = 1
    S[cos <= t_lo] = -1
    np.fill_diagonal(S, 1)
    return S


def ssdh_loss(outputs, onehot, S_batch=None, **_):
    """Pairwise consistency between code cosine similarity and the
    precomputed structure; S==0 pairs are masked out."""
    if S_batch is None:  # eval batches carry no structure
        return jnp.float32(0.0), {}
    h = jnp.tanh(outputs["codes"])
    hn = l2_normalize(h)
    sim = jnp.dot(hn, hn.T, preferred_element_type=jnp.float32)
    S_batch = jnp.asarray(S_batch)
    mask = (S_batch != 0).astype(jnp.float32)
    target = (S_batch > 0).astype(jnp.float32) * 2 - 1
    loss = (((sim - target) ** 2) * mask).sum() / jnp.maximum(mask.sum(), 1.0)
    return loss, {"pairwise": loss}


# ---------------------------------------------------------------------------
# NSH — Naturally-Sorted Hashing
# ---------------------------------------------------------------------------

def nsh_loss(outputs, onehot, tau: float = 1.0, temperature: float = 0.3,
             lambda_q: float = 0.1, lambda_c: float = 1.0, **_):
    """NSH (Yu et al., "Learning to Hash Naturally Sorts", IJCAI 2022) —
    reconstruction against the reference trainer contract (trainers/
    nsh.py:6-67: two concatenated views; model emits feats/codes/latents;
    loss(b, z)); the sdc loss module is absent upstream.

    Components:
      sort — NeuralSort-relaxed ranking self-supervision: for each anchor,
        candidates are soft-sorted by code similarity (the relaxed
        permutation's TOP row, i.e. P[0, j] of Grover et al.'s NeuralSort
        with scores s_j and absolute-difference sums); the listwise CE makes
        the anchor's other view rank first. This trains codes whose Hamming
        ranking "naturally sorts" true neighbors to the front.
      contrastive — NT-Xent on the continuous latents across views (shapes
        the latent space the sorting supervises against).
      quan — 1 - cos(tanh codes, signs).
    """
    n2 = outputs["codes"].shape[0]
    n = n2 // 2
    b = jnp.tanh(outputs["codes"].astype(jnp.float32))
    z = outputs["latents"].astype(jnp.float32)
    nbit = b.shape[1]
    pos = jnp.concatenate([jnp.arange(n) + n, jnp.arange(n)])

    # ---- NeuralSort top-row listwise loss over code similarities ----
    s = (b @ b.T) / nbit                       # (2B, 2B) in [-1, 1]
    valid = ~jnp.eye(n2, dtype=bool)
    # A[i, j] = sum over valid l of |s[i, j] - s[i, l]|
    diff = jnp.abs(s[:, :, None] - s[:, None, :])        # (2B, j, l)
    A = jnp.where(valid[:, None, :], diff, 0.0).sum(-1)  # (2B, 2B)
    m = n2 - 1                                           # candidates per anchor
    r = ((m - 1) * s - A) / jnp.maximum(tau, 1e-6)
    r = jnp.where(valid, r, -1e9)
    logp = jax.nn.log_softmax(r, axis=-1)
    sort_loss = -logp[jnp.arange(n2), pos].mean()

    # ---- NT-Xent on latents ----
    zn = l2_normalize(z)
    sim = jnp.dot(zn, zn.T, preferred_element_type=jnp.float32) / temperature
    sim = jnp.where(jnp.eye(n2, dtype=bool), -1e9, sim)
    contrastive = -jax.nn.log_softmax(sim, axis=-1)[jnp.arange(n2), pos].mean()

    # ---- quantization ----
    bn = l2_normalize(b)
    quan = (1.0 - (bn * jnp.sign(b) / jnp.sqrt(nbit)).sum(-1)).mean()

    total = sort_loss + lambda_c * contrastive + lambda_q * quan
    return total, {"sort": sort_loss, "contrastive": contrastive, "quan": quan}
