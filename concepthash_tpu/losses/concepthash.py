"""ConceptHash (LGH) training objective — pure function.

Weighted sum gated by ``loss_scales`` (reference models/loss/coop.py:120-189):
margin-CE on continuous-center logits, on binary-center logits, per-concept
CE, optional blended cont/bin softmax ("hash_logits"), optional attention
diversity. The quantization cosine gap is logged but carries no gradient
(reference :121-123). Canonical config: scales {bin:1, cont:1, concept:1},
margin 0.2, scale 8 (configs/model/concept_hash_final_v1_nosa_apt.yaml:53-68).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from concepthash_tpu.losses.common import margin_ce, margin_logits, quantization_cosine

from concepthash_tpu.ops.numerics import l2_normalize

DEFAULT_SCALES = {
    "logits": 0.0,
    "hash_logits": 0.0,
    "bin_logits": 1.0,
    "cont_logits": 1.0,
    "concept_logits": 1.0,
    "attn_div_loss": 0.0,
    "filip_logits": 0.0,
}


def lgh_loss(outputs: dict, onehot, margin: float = 0.2, scale: float = 8.0,
             loss_scales: dict | None = None, lmbd: float = 0.5,
             avg_before_softmax: bool = False, div_method: int = 1,
             div_min: float = 0.0, ncontext: int = 4, nregs: int = 0,
             avg_attn: bool = False, concept_cossim: bool = True,
             exponential_scale: float = 0.0, **_ignored):
    scales = dict(DEFAULT_SCALES)
    scales.update(loss_scales or {})
    parts = {}
    total = 0.0

    parts["quan"] = jax.lax.stop_gradient(quantization_cosine(outputs["codes"]))

    def on(key):
        return scales.get(key, 0.0) != 0.0

    if on("logits"):
        parts["aux"] = margin_ce(outputs["logits"], onehot, margin, scale)
        total += scales["logits"] * parts["aux"]

    if on("concept_logits"):
        lc = outputs["logits_concept"]  # (Q, B, C)
        norm = onehot / jnp.clip(onehot.sum(-1, keepdims=True), 1e-12)
        if concept_cossim:
            from concepthash_tpu.losses.common import margin_logits as _ml

            lc = _ml(lc, onehot[None], margin, scale)
        logp = jax.nn.log_softmax(lc, axis=-1)
        per_concept = -(norm[None] * logp).sum(-1).mean(-1)  # (Q,)
        if exponential_scale > 0:
            # later concepts weighted higher (reference models/loss/coop.py:79-83)
            w = jnp.exp(-jnp.arange(ncontext - 1, -1, -1) / exponential_scale)
            parts["concept"] = (w * per_concept).sum()
        else:
            parts["concept"] = per_concept.mean()
        total += scales["concept_logits"] * parts["concept"]

    if on("filip_logits"):
        f = 0.5 * (margin_ce(outputs["logits_filip_i2t"], onehot, margin, scale)
                   + margin_ce(outputs["logits_filip_t2i"], onehot, margin, scale))
        parts["filip"] = f
        total += scales["filip_logits"] * f

    if on("hash_logits"):
        parts["hash"] = _blended_hash_loss(outputs["logits_cont"],
                                           outputs["logits_bin"], onehot,
                                           margin, scale, lmbd, avg_before_softmax)
        total += scales["hash_logits"] * parts["hash"]

    if on("cont_logits"):
        parts["cont"] = margin_ce(outputs["logits_cont"], onehot, margin, scale)
        total += scales["cont_logits"] * parts["cont"]

    if on("bin_logits"):
        parts["bin"] = margin_ce(outputs["logits_bin"], onehot, margin, scale)
        total += scales["bin_logits"] * parts["bin"]

    if on("attn_div_loss") and "attn_cache" in outputs:
        # eval forwards skip the attention materialization (opt-in only)
        parts["attn_div"] = attention_diversity(outputs["attn_cache"], ncontext,
                                                nregs, div_method, div_min, avg_attn)
        total += scales["attn_div_loss"] * parts["attn_div"]

    return total, parts


def _blended_hash_loss(logits_1, logits_2, onehot, margin, scale, lmbd,
                       avg_before_softmax):
    """lmbd-blend of cont/bin class probabilities before the log
    (reference models/loss/coop.py:89-118)."""
    if avg_before_softmax:
        return margin_ce(lmbd * logits_1 + (1 - lmbd) * logits_2, onehot,
                         margin, scale)
    ml1 = margin_logits(logits_1, onehot, margin, scale)
    ml2 = margin_logits(logits_2, onehot, margin, scale)
    prob = (lmbd * jax.nn.softmax(ml1, -1) + (1 - lmbd) * jax.nn.softmax(ml2, -1))
    logp = jnp.log(jnp.clip(prob, 1e-7))
    norm = onehot / jnp.clip(onehot.sum(-1, keepdims=True), 1e-12)
    return -(norm * logp).sum(-1).mean()


def attention_diversity(attn_cache, ncontext: int, nregs: int = 0,
                        div_method: int = 1, div_min: float = 0.0,
                        avg_attn: bool = False):
    """Mean upper-triangular cosine among the concept tokens' patch-attention
    maps (reference models/loss/coop.py:164-187). attn_cache: tuple of
    (B, H, L, L) per layer; uses the last (or layer-mean)."""
    attn = (jnp.stack(attn_cache).mean(0) if avg_attn else attn_cache[-1])
    if nregs:
        maps = attn[:, :, -(ncontext + nregs):-nregs, 1:-(ncontext + nregs)]
    else:
        maps = attn[:, :, -ncontext:, 1:-ncontext]
    maps = maps.mean(axis=1)  # (B, Q, P) mean over heads
    maps = l2_normalize(maps)
    cos = jnp.einsum("bqp,bkp->bqk", maps, maps)
    if div_method == 0:
        cos = jax.nn.relu(cos - div_min)
    cos = cos.mean(axis=0)  # (Q, Q)
    q = cos.shape[0]
    triu = jnp.triu(jnp.ones((q, q), bool), 1)
    return (cos * triu).sum() / jnp.maximum(triu.sum(), 1)
