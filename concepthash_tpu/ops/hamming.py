"""Bit-packed Hamming distance for TPU.

The reference scores retrieval with Hamming distance over signed codes
(``dist_metric: "hamming"``, reference configs/train.yaml:21; semantics of the
missing ``utils.hashing.get_hamm_dist`` reconstructed in SURVEY.md §2.6).
TPU-native design: codes are packed to uint32 lanes and distances computed
with ``lax.population_count`` on the VPU — nbit=64 becomes 2 uint32 XOR+popcounts
per pair instead of a 64-wide float dot product. A sign-matmul path
(0.5*(nbit - s_q @ s_db^T), runs on the MXU) is kept both as a cross-check and
for ternary codes (``ternary_threshold`` in reference configs/val.yaml:12),
where zeroed bits make popcount inapplicable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def pack_bits(codes: jax.Array, threshold: float = 0.0) -> jax.Array:
    """Pack real-valued codes (..., nbit) into uint32 lanes (..., ceil(nbit/32)).

    Bit j is set iff ``codes[..., j] > threshold`` — i.e. the sign bit of the
    reference's ``torch.sign`` convention (sign==0 counts as negative).
    """
    nbit = codes.shape[-1]
    nlanes = -(-nbit // 32)
    pad = nlanes * 32 - nbit
    bits = (codes > threshold).astype(jnp.uint32)
    if pad:
        bits = jnp.pad(bits, [(0, 0)] * (bits.ndim - 1) + [(0, pad)])
    bits = bits.reshape(*bits.shape[:-1], nlanes, 32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return (bits << shifts).sum(axis=-1).astype(jnp.uint32)


def hamming_packed(q: jax.Array, db: jax.Array) -> jax.Array:
    """Pairwise Hamming distance between packed codes.

    q: (Q, L) uint32, db: (N, L) uint32 -> (Q, N) int32.
    """
    x = jnp.bitwise_xor(q[:, None, :], db[None, :, :])
    return jax.lax.population_count(x).astype(jnp.int32).sum(axis=-1)


def hamming_signs(q_codes: jax.Array, db_codes: jax.Array,
                  threshold: float = 0.0) -> jax.Array:
    """MXU path: Hamming via sign dot products. Supports ternary codes:
    entries with |c| <= threshold become 0 and contribute 0.5 each (the
    generalization of hamm = 0.5*(nbit - <s_q, s_db>))."""
    nbit = q_codes.shape[-1]
    sq = ternary_sign(q_codes, threshold)
    sdb = ternary_sign(db_codes, threshold)
    dot = jnp.dot(sq, sdb.T, preferred_element_type=jnp.float32)
    return 0.5 * (nbit - dot)


def ternary_sign(codes: jax.Array, threshold: float = 0.0) -> jax.Array:
    """sign() with a dead zone: +1 / -1 / 0 (|c| <= threshold -> 0).

    With threshold=0 this matches torch.sign (0 -> 0)."""
    pos = (codes > threshold).astype(jnp.float32)
    neg = (codes < -threshold).astype(jnp.float32)
    return pos - neg


def get_hamm_dist(codes, codebook, threshold: float = 0.0, normalize: bool = False):
    """API-parity with the reference's ``utils.hashing.get_hamm_dist``
    (call site: reference trainers/orthohash.py:362)."""
    nbit = codes.shape[-1]
    dist = hamming_signs(jnp.asarray(codes), jnp.asarray(codebook), threshold)
    if normalize:
        dist = dist / nbit
    return dist


def pack_bits_np(codes: np.ndarray, threshold: float = 0.0) -> np.ndarray:
    """NumPy twin of :func:`pack_bits` (host-side galleries / tests)."""
    nbit = codes.shape[-1]
    nlanes = -(-nbit // 32)
    pad = nlanes * 32 - nbit
    bits = (codes > threshold).astype(np.uint32)
    if pad:
        bits = np.pad(bits, [(0, 0)] * (bits.ndim - 1) + [(0, pad)])
    bits = bits.reshape(*bits.shape[:-1], nlanes, 32)
    shifts = np.arange(32, dtype=np.uint32)
    return (bits << shifts).sum(axis=-1).astype(np.uint32)
