"""Shared model layers: cosine classifier, sign straight-through estimator,
code batch-norm (cross-replica), small MLP builder.

Re-designs of reference models/layers/{cossim.py, signhash.py} and the
BatchNorm1d-on-codes pattern (reference models/arch/coop.py:341-347,
models/arch/orthohash.py:30-34). BatchNorm batch statistics are synchronized
across the 'data' mesh axis with a psum (axis_name), which the single-GPU
reference never needed but data-parallel TPU training does (SURVEY.md §7
hard-part 2).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def _group_normalize(v, group: int):
    """L2-normalize per contiguous sub-group of the last dim, then flatten."""
    from concepthash_tpu.ops.numerics import l2_normalize

    g = v.reshape(*v.shape[:-1], group, -1)
    return l2_normalize(g).reshape(*v.shape)


class CosSim(nn.Module):
    """Cosine-similarity classifier: normalize(x) @ normalize(centroids)^T.

    ``codebook``: optional fixed (nclass, nfeat) centroids; ``learn_cent``
    False registers them as a constant instead of a parameter.
    ``group``: per-sub-code cosine (both sides normalized per group, logits
    averaged over groups); ``single_quan``: averages the group-cosine logits
    against the continuous and the signed centroids (a built-in quantization
    objective); ``input_group``: group-normalizes only the input side.
    (reference models/layers/cossim.py:6-82 — all paths.)
    """

    nfeat: int
    nclass: int
    codebook: Optional[jnp.ndarray] = None
    learn_cent: bool = True
    group: int = 1
    single_quan: bool = False
    input_group: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, sign_centroids: bool = False):
        if self.codebook is not None:
            init = lambda *_: jnp.asarray(self.codebook, jnp.float32)
        else:
            init = nn.initializers.normal(1.0)
        if self.learn_cent:
            cent = self.param("centroids", init, (self.nclass, self.nfeat), jnp.float32)
        else:
            cent = self.variable("constants", "centroids", init,
                                 (self.nclass, self.nfeat), jnp.float32).value
        cent = cent.astype(self.dtype)
        if sign_centroids:
            cent = jnp.sign(cent)
        if self.single_quan:
            # (cossim.py:47-60) group-cosine against continuous AND signed
            # centroids, averaged — quantization pressure inside the logits
            xn = _group_normalize(x, self.group)
            cn = _group_normalize(cent, self.group)
            cs = jnp.sign(cn)
            l1 = jnp.dot(xn, cn.T, preferred_element_type=jnp.float32)
            l2 = jnp.dot(xn, cs.T, preferred_element_type=jnp.float32)
            return (l1 + l2) * 0.5 / self.group
        if self.input_group != 1:
            # (cossim.py:63-68) group-normalize then re-normalize the input;
            # centroids normalized whole
            from concepthash_tpu.ops.numerics import l2_normalize

            xn = l2_normalize(_group_normalize(x, self.input_group))
            cn = l2_normalize(cent)
            return jnp.dot(xn, cn.T,
                           preferred_element_type=jnp.float32) / self.group
        xn = _group_normalize(x, self.group)
        cn = _group_normalize(cent, self.group)
        return jnp.dot(xn, cn.T,
                       preferred_element_type=jnp.float32) / self.group


def sign_ste(x):
    """sign() forward, identity backward (straight-through estimator;
    reference models/layers/signhash.py:6-24)."""
    return x + jax.lax.stop_gradient(jnp.sign(x) - x)


class CodeBatchNorm(nn.Module):
    """BatchNorm over hash codes, torch-BatchNorm1d-compatible semantics
    (momentum 0.1 torch == 0.9 flax), stats psum'd over the data axis when
    running under shard_map/pjit with axis_name present."""

    momentum: float = 0.9
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=self.momentum,
            epsilon=1e-5,
            dtype=self.dtype,
            axis_name=self.axis_name if train else None,
            name="bn",
        )(x)


class DecorrelatedBN(nn.Module):
    """Grouped decorrelated (whitening) batch norm over hash codes —
    the ``add_bn: 'dbn'`` option (reference models/layers/iternorm.py DBN,
    used at models/arch/coop.py:342-345 with groups=ncontext).

    Whitening matrix Sigma^{-1/2} per group via Newton-Schulz iteration
    (IterNorm, Huang et al. 2019) — pure matmuls, MXU-friendly and
    differentiable; running mean/whitening kept for eval."""

    groups: int = 4
    momentum: float = 0.9
    iters: int = 5
    eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        B, nbit = x.shape
        G = self.groups
        d = nbit // G
        xg = x.astype(jnp.float32).reshape(B, G, d)

        r_mean = self.variable("batch_stats", "mean",
                               lambda: jnp.zeros((G, d), jnp.float32))
        r_whiten = self.variable(
            "batch_stats", "whiten",
            lambda: jnp.broadcast_to(jnp.eye(d), (G, d, d)).copy())

        if train:
            mean = xg.mean(axis=0)                      # (G, d)
            xc = xg - mean[None]
            cov = jnp.einsum("bgi,bgj->gij", xc, xc) / B
            cov = cov + self.eps * jnp.eye(d)[None]
            tr = jnp.trace(cov, axis1=1, axis2=2)[:, None, None]
            sigma_n = cov / tr
            p = jnp.broadcast_to(jnp.eye(d), (G, d, d))
            for _ in range(self.iters):
                p = 1.5 * p - 0.5 * jnp.einsum(
                    "gab,gbc,gcd,gde->gae", p, p, p, sigma_n)
            whiten = p / jnp.sqrt(tr)
            if not self.is_initializing():
                r_mean.value = (self.momentum * r_mean.value
                                + (1 - self.momentum) * mean)
                r_whiten.value = (self.momentum * r_whiten.value
                                  + (1 - self.momentum) * whiten)
        else:
            mean, whiten = r_mean.value, r_whiten.value
            xc = xg - mean[None]

        out = jnp.einsum("bgi,gij->bgj", xc, whiten)
        return out.reshape(B, nbit).astype(self.dtype)


class MLP(nn.Module):
    """Dense stack, e.g. the text_projection 512->512->nbit of the canonical
    ConceptHash config (reference configs/model/concept_hash_final_v1_nosa_apt.yaml:38-47)."""

    features: tuple
    final_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i, f in enumerate(self.features[:-1]):
            x = nn.Dense(f, dtype=self.dtype, name=f"fc{i}")(x)
            x = nn.relu(x)
        return nn.Dense(self.features[-1], use_bias=self.final_bias,
                        dtype=self.dtype, name=f"fc{len(self.features) - 1}")(x)
