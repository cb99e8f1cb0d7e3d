"""ConceptHash: the flagship model (CVPRW 2024).

M learnable concept queries are refined by one self-attention block, projected
into the vision width, appended to the CLIP patch sequence, and contextualized
by the (adapter-tuned, otherwise frozen) CLIP encoder; each concept's output
token maps to an nbit/M sub-code; sub-codes concatenate and batch-normalize
into the full code. Class centers come from CLIP *text* embeddings of class
names, projected by a small trainable MLP.

Capability-equivalent redesign of reference models/arch/coop.py:180-625
(LGHWithoutText / LGHWithFixedPrompt) restricted to the paths the canonical
config exercises (configs/model/concept_hash_final_v1_nosa_apt.yaml): multi
hash-queries + single shared hash_fc + hash_pe, concat ensemble, BatchNorm on
codes, fixed 512-d continuous centers + text_projection MLP, per-concept
CosSim classifier (concept_reg). Options kept: nregs registers, learnable
center fallback, mean ensemble, use_before_projection switch, optional
attention-map output for the diversity loss.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from concepthash_tpu.models.clip import AdapterConfig, ClipVisionConfig, ClipVisionTower
from concepthash_tpu.models.layers import CodeBatchNorm, CosSim, MLP

from concepthash_tpu.ops.numerics import l2_normalize


@dataclasses.dataclass(frozen=True)
class SelfAttnLastConfig:
    """Optional last-layer SelfAttention with Gaussian attention masking
    (reference models/arch/coop.py:20-177; the canonical "nosa" config
    disables it — enabled via model.self_attn_at_last)."""

    params: bool = True           # learned q/k/v (False -> identity)
    strong: bool = False          # q/k/v = Linear-LN-ReLU-Linear stacks
    mask_sigma: float = 0.0       # 0 = no Gaussian masking
    cross_attention: bool = False  # concept->patch region only, rest zeroed
    differentiable: bool = False  # soft-argmax center instead of argmax
    add_pe: bool = False          # learnable PE on the concept tokens


class SelfAttentionAtLast(nn.Module):
    """Single-head self-attention over the full [cls; patches; concepts]
    sequence whose concept->patch attention block is re-focused by a Gaussian
    bump centered on each concept's attention argmax (reference
    mask_attention_map, coop.py:96-143). Returns (attn (B,1,L,L), tokens).

    Deviations (documented): the Gaussian is centered at the true argmax
    (row=y, col=x) — the reference transposes the center coordinates via its
    meshgrid indexing; and the ``differentiable`` variant uses a proper
    softmax-expectation of the location (the reference's differentiable
    branch has a broadcast-shape bug and is unused upstream)."""

    cfg: SelfAttnLastConfig
    ncontext: int
    dim: int
    dtype: Any = jnp.float32

    def _qkv(self, name):
        if not self.cfg.params:
            return lambda x: x
        if self.cfg.strong:
            def f(x):
                h = nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                             name=f"{name}_1")(x)
                h = nn.LayerNorm(dtype=self.dtype, name=f"{name}_ln")(h)
                return nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                                name=f"{name}_2")(nn.relu(h))

            return f
        return nn.Dense(self.dim, use_bias=False, dtype=self.dtype, name=name)

    def _gaussian_mask(self, region):
        """region: (B, M, P) concept->patch attention; P must be square."""
        B, M, P = region.shape
        H = int(round(P ** 0.5))
        assert H * H == P, f"patch grid must be square, got {P} tokens"
        grid = region.reshape(B, M, H, H)
        ys = jnp.arange(H, dtype=jnp.float32)
        if self.cfg.differentiable:
            w = jax.nn.softmax(region.astype(jnp.float32), axis=-1)
            w = w.reshape(B, M, H, H)
            max_y = (w.sum(3) * ys).sum(2)  # (B, M)
            max_x = (w.sum(2) * ys).sum(2)
        else:
            loc = jnp.argmax(region, axis=-1)  # (B, M)
            max_y = (loc // H).astype(jnp.float32)
            max_x = (loc % H).astype(jnp.float32)
        yy = ys.reshape(1, 1, H, 1)
        xx = ys.reshape(1, 1, 1, H)
        bump = jnp.exp(-((xx - max_x[:, :, None, None]) ** 2 +
                         (yy - max_y[:, :, None, None]) ** 2)
                       / (2.0 * self.cfg.mask_sigma ** 2))
        bump = bump / (bump.reshape(B, M, -1).max(axis=-1)[:, :, None, None] + 1e-12)
        return (grid * bump).reshape(B, M, P)

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        M = self.ncontext
        B, L, _ = x.shape
        if c.add_pe:
            pe = self.param("pe", nn.initializers.normal(1.0),
                            (1, M, self.dim), jnp.float32)
            x = x.at[:, -M:, :].add(pe.astype(x.dtype))
        q = self._qkv("q")(x)
        k = self._qkv("k")(x)
        v = self._qkv("v")(x)
        scale = self.dim ** -0.5
        attn = jnp.einsum("bld,bmd->blm", q, k).astype(jnp.float32)

        if c.cross_attention:
            region = jax.nn.softmax(attn[:, -M:, 1:-M] * scale, axis=-1)
            if c.mask_sigma != 0:
                region = self._gaussian_mask(region)
            attn = jnp.zeros_like(attn).at[:, -M:, 1:-M].set(region)
        else:
            if c.mask_sigma != 0:
                attn = attn.at[:, -M:, 1:-M].set(
                    self._gaussian_mask(attn[:, -M:, 1:-M]))
            attn = jax.nn.softmax(attn * scale, axis=-1)

        out = jnp.einsum("blm,bmd->bld", attn.astype(v.dtype), v)
        return attn[:, None], out  # (B, 1, L, L), (B, L, D)


@dataclasses.dataclass(frozen=True)
class ConceptHashConfig:
    nbit: int = 64
    nclass: int = 200
    ncontext: int = 4                  # M concept tokens
    nregs: int = 0                     # extra register tokens (ignored by head)
    num_heads: int = 8                 # hash-query self-attention heads
    dropout: float = 0.1
    add_bn: object = True            # True | False | "dbn"
    use_before_projection: bool = True  # sub-codes from 768-d tokens (pre proj)
    hash_pe: bool = True
    ensemble_method: str = "concat"    # 'concat' | 'avg'
    concept_reg: bool = True
    concept_cossim: bool = True
    vpt_pe: bool = False               # per-layer prompts on concept tokens
    learnable_center: bool = False     # True -> no text codebook, learn centers
    text_projection_dims: tuple = (512, 512)  # hidden dims; final = nbit
    center_dim: int = 512              # language-embedding width
    self_attn_at_last: Optional[SelfAttnLastConfig] = None


class HashQueryBlock(nn.Module):
    """One self-attention block refining the M+nregs hash queries, then a
    projection into the vision width (reference models/arch/coop.py:349-427,
    v1 forward: x = norm1(x) + sa(x); x = norm2(x) + ffn(x); x = ffn2(x))."""

    embed_dim: int
    vision_dim: int
    num_heads: int
    dropout: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dtype=self.dtype,
            dropout_rate=self.dropout, deterministic=not train, name="sa")(x, x)
        x = nn.LayerNorm(dtype=self.dtype, name="norm1")(x) + attn
        h = nn.Dense(self.embed_dim, dtype=self.dtype, name="ffn_fc1")(x)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.Dense(self.embed_dim, dtype=self.dtype, name="ffn_fc2")(h)
        x = nn.LayerNorm(dtype=self.dtype, name="norm2")(x) + h
        return nn.Dense(self.vision_dim, dtype=self.dtype, name="ffn2")(x)


class ConceptHash(nn.Module):
    vision_cfg: ClipVisionConfig
    cfg: ConceptHashConfig
    adapters: Optional[AdapterConfig] = AdapterConfig()
    fixed_center: Optional[jnp.ndarray] = None  # (nclass, center_dim) text embeds
    token_embeds: Optional[jnp.ndarray] = None  # (nclass, T, proj) FILIP texts
    dtype: Any = jnp.float32
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, images, train: bool = False,
                 output_attentions: bool = False):
        c = self.cfg
        vc = self.vision_cfg
        B = images.shape[0]
        M = c.ncontext
        embed_dim = vc.projection_dim
        if c.self_attn_at_last is not None and not c.use_before_projection:
            raise ValueError(
                "self_attn_at_last composes with use_before_projection=True "
                "(the reference's own usage — its 'apt' configs keep the flag "
                "on); projecting the re-attended tokens is not wired")

        # ---- concept (hash) queries -> vision-width context tokens ----
        queries = self.param("hash_queries", nn.initializers.normal(1.0),
                             (1, M + c.nregs, embed_dim), jnp.float32)
        ctx = HashQueryBlock(embed_dim, vc.hidden_size, c.num_heads, c.dropout,
                             self.dtype, name="hash_attention")(
            queries.astype(self.dtype), train)
        ctx = jnp.broadcast_to(ctx, (B, M + c.nregs, vc.hidden_size))

        # ---- CLIP encoder over [cls; patches; concepts] ----
        backbone = ClipVisionTower(vc, adapters=self.adapters, dtype=self.dtype,
                                   vpt_tokens=(M + c.nregs) if c.vpt_pe else 0,
                                   name="backbone")
        need_projected = (not c.use_before_projection or
                          self.token_embeds is not None)
        enc = backbone(images, extra_tokens=ctx,
                       output_attentions=output_attentions,
                       project_extra=need_projected, train=train)

        def slice_concepts(tokens):
            return (tokens[:, -(M + c.nregs):-c.nregs, :] if c.nregs
                    else tokens[:, -M:, :])

        last_hidden = enc["last_hidden_state"]
        last_attn = None
        if c.self_attn_at_last is not None:
            # optional extra attention layer with Gaussian masking (reference
            # coop.py:487-494 applies it to the full last hidden state;
            # composes with use_before_projection=True — the reference's own
            # usage; the "apt" configs keep that flag on)
            last_attn, last_hidden = SelfAttentionAtLast(
                c.self_attn_at_last, M + c.nregs, vc.hidden_size,
                dtype=self.dtype, name="self_attn_at_last")(last_hidden)

        concept_tokens = slice_concepts(last_hidden)  # (B, M, D)
        projected_concepts = (slice_concepts(enc["extra_projected"])
                              if need_projected else None)
        if not c.use_before_projection:
            concept_tokens = projected_concepts

        # ---- per-concept sub-codes ----
        feat_dim = concept_tokens.shape[-1]
        if c.hash_pe:
            pe = self.param("hash_pe", nn.initializers.normal(1.0),
                            (1, M, feat_dim), jnp.float32)
            hash_in = concept_tokens + pe.astype(self.dtype)
        else:
            hash_in = concept_tokens
        sub_dim = c.nbit // M if c.ensemble_method == "concat" else c.nbit
        sub_codes = nn.Dense(sub_dim, use_bias=False, dtype=self.dtype,
                             name="hash_fc")(hash_in)  # (B, M, sub)
        if c.ensemble_method == "concat":
            codes = sub_codes.reshape(B, c.nbit)
        else:
            codes = sub_codes.mean(axis=1)
        if c.add_bn == "dbn":
            from concepthash_tpu.models.layers import DecorrelatedBN

            codes = DecorrelatedBN(groups=M, dtype=self.dtype,
                                   name="hash_bn")(codes, train)
        elif c.add_bn:
            codes = CodeBatchNorm(axis_name=self.bn_axis_name, dtype=self.dtype,
                                  name="hash_bn")(codes, train)
        codes = codes.astype(jnp.float32)

        # ---- language-guided centers ----
        if c.learnable_center:
            center = self.param("center", nn.initializers.normal(0.02),
                                (c.nclass, c.nbit), jnp.float32)
        else:
            init = (lambda *_: jnp.asarray(self.fixed_center, jnp.float32)) \
                if self.fixed_center is not None else nn.initializers.normal(1.0)
            raw = self.variable("constants", "center", init,
                                (c.nclass, c.center_dim), jnp.float32).value
            center = MLP((*c.text_projection_dims, c.nbit), dtype=self.dtype,
                         name="text_projection")(raw.astype(self.dtype))
            center = center.astype(jnp.float32)

        codes_n = l2_normalize(codes)
        center_n = l2_normalize(center)
        cont_logits = jnp.dot(codes_n, center_n.T, preferred_element_type=jnp.float32)
        bin_logits = jnp.dot(codes_n, (jnp.sign(center_n) / (c.nbit ** 0.5)).T,
                             preferred_element_type=jnp.float32)

        outputs = {
            "logits_cont": cont_logits,
            "logits_bin": bin_logits,
            "codes": codes,
            "hash_features": concept_tokens,
        }
        if c.ensemble_method == "avg":
            outputs["ensemble_codes"] = sub_codes

        # ---- per-concept classifier (concept_reg) ----
        if c.concept_reg:
            cpe = self.param("concept_pe",
                             lambda k, s, d: 0.02 * jax.random.normal(k, s, d),
                             (1, M, feat_dim), jnp.float32)
            feats = concept_tokens + cpe.astype(self.dtype)  # (B, M, D)
            if c.concept_cossim:
                clf = CosSim(feat_dim, c.nclass, dtype=self.dtype, name="concept_ce")
            else:
                clf = nn.Dense(c.nclass, use_bias=False, dtype=self.dtype,
                               name="concept_ce")
            logits_concept = clf(feats.reshape(B * M, feat_dim))
            outputs["logits_concept"] = (
                logits_concept.reshape(B, M, c.nclass).transpose(1, 0, 2))  # (M,B,C)

        if output_attentions:
            attns = enc["attentions"]
            if last_attn is not None:  # reference coop.py:490-492
                attns = tuple(attns) + (last_attn,)
            outputs["attn_cache"] = attns

        # ---- FILIP token-level image<->text logits (optional) ----
        # reference LGHWithFixedPromptFILIP (models/arch/coop.py:628-678):
        # projected concept tokens vs per-class text-token embeddings;
        # max over text tokens then mean over concepts (i2t) and vice versa.
        if self.token_embeds is not None:
            tok = self.variable(
                "constants", "token_embeds",
                lambda: jnp.asarray(self.token_embeds, jnp.float32)).value
            hf = projected_concepts.astype(jnp.float32)  # (B, M, proj)
            hf = l2_normalize(hf)
            tf = l2_normalize(tok)
            sim = jnp.einsum("bmd,ctd->bcmt", hf.astype(jnp.float32), tf)
            i2t = sim.max(axis=-1).mean(axis=-1)   # max text tok, mean concepts
            t2i = sim.max(axis=-2).mean(axis=-1)   # max concepts, mean text tok
            outputs["logits_filip_i2t"] = i2t
            outputs["logits_filip_t2i"] = t2i
            outputs["logits_filip"] = 0.5 * (i2t + t2i)
        return outputs
