"""Flax CLIP (vision + text) with parameter-efficient adapters.

TPU-first re-implementation of the backbone the reference builds from HF
transformers (reference models/backbone/clip.py:107-254; adapter grafting at
models/layers/adapter.py:398-421, models/arch/base.py:29-44). Differences by
design:

  - pure functional flax modules; compute dtype configurable (bfloat16 on TPU,
    params stay float32) so matmuls hit the MXU at full rate;
  - attention maps are NOT materialized unless asked (the reference always
    runs with ``output_attentions=True`` — models/arch/coop.py:476-479 — which
    materializes all 12 L×L attention tensors every step; here it is opt-in);
  - extra (concept) tokens are a first-class input to the tower rather than a
    monkey-patched embeddings module;
  - position-embedding resizing for non-native resolutions replays torch
    F.interpolate(mode='bicubic') EXACTLY (a=-0.75 kernel via trace-time
    interpolation matrices, _torch_bicubic_matrix — jax.image's Keys a=-0.5
    would drift); parity vs torch is pinned at 448² in
    tests/test_clip_port.py.

Weight porting from HF checkpoints lives in ``clip_loader.py`` with per-layer
activation-parity tests (tests/test_clip_port.py).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ClipVisionConfig:
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    image_size: int = 224
    patch_size: int = 32
    projection_dim: int = 512
    layer_norm_eps: float = 1e-5
    hidden_act: str = "quick_gelu"
    # generic-ViT compatibility flags (timm/HF ViT: biased patch embed,
    # plain gelu, no pre-layernorm; CLIP: the defaults below)
    patch_bias: bool = False
    use_pre_layernorm: bool = True
    attention_impl: str = "auto"  # 'auto' | 'pallas' | 'xla'
    fused_ln: str = "auto"        # fused LN->matmul kernel (ops/fused_ln.py)
    remat: bool = False           # rematerialize encoder layers (trade FLOPs
                                  # for activation memory on big towers)

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def seq_len(self) -> int:
        return self.num_patches + 1


@dataclasses.dataclass(frozen=True)
class ClipTextConfig:
    hidden_size: int = 512
    intermediate_size: int = 2048
    num_layers: int = 12
    num_heads: int = 8
    max_position_embeddings: int = 77
    vocab_size: int = 49408
    projection_dim: int = 512
    layer_norm_eps: float = 1e-5
    hidden_act: str = "quick_gelu"
    eos_token_id: int = 49407


@dataclasses.dataclass(frozen=True)
class AdapterConfig:
    """Bottleneck adapters added in parallel to attention & MLP outputs
    (reference models/layers/adapter.py:11-60,146-170). ``attention_qkvo``
    switches to per-projection adapters inside attention instead
    (q/k/v/out; reference clip_add_attention_adapter_, adapter.py:420-439)."""

    bottleneck_dim: int = 384
    after_attention: bool = True   # reference adapt_mlp_1
    after_mlp: bool = True         # reference adapt_mlp_2
    layernorm_in: bool = True
    attention_qkvo: bool = False


def activation(name: str):
    if name == "quick_gelu":
        return lambda x: x * jax.nn.sigmoid(1.702 * x)
    if name == "gelu":
        return lambda x: jax.nn.gelu(x, approximate=False)
    raise ValueError(name)


class Adapter(nn.Module):
    """LN-in -> down -> GELU -> up (zero-init) -> learnable scale."""

    cfg: AdapterConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.cfg.layernorm_in:
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln")(x)
        h = nn.Dense(self.cfg.bottleneck_dim, dtype=self.dtype, name="down")(x)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(x.shape[-1], dtype=self.dtype, name="up",
                     kernel_init=nn.initializers.zeros)(h)
        scale = self.param("scale", nn.initializers.ones, (1,), jnp.float32)
        return h * scale.astype(self.dtype)


class PatchEmbedding(nn.Module):
    """Patch projection with a conv-shaped (p, p, C, D) kernel applied as a
    flattened matmul (see ClipVisionTower for the MXU rationale)."""

    features: int
    patch_size: int
    in_channels: int = 3
    use_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, patches):  # (B, P, p*p*C)
        p, C = self.patch_size, self.in_channels
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (p, p, C, self.features), jnp.float32)
        w = kernel.reshape(p * p * C, self.features).astype(self.dtype)
        out = jnp.dot(patches, w, preferred_element_type=self.dtype)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            out = out + bias.astype(self.dtype)
        return out


class _LNParamsMirror(nn.Module):
    """Same param tree as nn.LayerNorm ({scale, bias}) but hands the params
    to the caller so the fused LN->matmul kernel (ops/fused_ln.py) can
    consume them. Checkpoints are interchangeable with the unfused path."""

    @nn.compact
    def __call__(self, D: int):
        return (self.param("scale", nn.initializers.ones, (D,)),
                self.param("bias", nn.initializers.zeros, (D,)))


class _DenseParamsMirror(nn.Module):
    """Same param tree as nn.Dense ({kernel, bias}), params handed back."""

    features: int
    kernel_init: Any = None  # default: nn.Dense's lecun_normal

    @nn.compact
    def __call__(self, D: int):
        init = self.kernel_init or nn.initializers.lecun_normal()
        return (self.param("kernel", init, (D, self.features)),
                self.param("bias", nn.initializers.zeros, (self.features,)))


class MultiHeadAttention(nn.Module):
    """CLIP-style MHA (bias on q/k/v/out). Returns (out, probs|None).

    ``attention_impl``: 'xla' (einsum path, required when probabilities are
    requested), 'pallas' (fused VMEM kernel, ops/attention.py), or 'auto'
    (pallas on TPU when probs are not needed).

    ``ln``: optional (scale, bias, eps) of the preceding LayerNorm — when
    given, x must be UN-normalized and q/k/v are produced by one fused
    LN->matmul kernel over the concatenated qkv weights."""

    num_heads: int
    dtype: Any = jnp.float32
    attention_impl: str = "auto"
    adapters: Optional["AdapterConfig"] = None  # q/k/v/out adapters

    @nn.compact
    def __call__(self, x, output_attentions: bool = False, ln=None):
        B, L, D = x.shape
        H = self.num_heads
        hd = D // H
        qkvo = self.adapters is not None and self.adapters.attention_qkvo

        def proj(name, inp):
            y = nn.Dense(D, dtype=self.dtype, name=name)(inp)
            if qkvo:  # parallel adapter on the projection input
                y = y + Adapter(self.adapters, self.dtype,
                                name=f"adapter_{name}")(inp)
            return y

        dense = lambda name: (lambda inp: proj(name, inp))
        if ln is not None:
            from concepthash_tpu.ops.fused_ln import ln_matmul

            scale_ln, bias_ln, eps = ln
            kq, bq = _DenseParamsMirror(D, name="q_proj")(D)
            kk, bk = _DenseParamsMirror(D, name="k_proj")(D)
            kv, bv = _DenseParamsMirror(D, name="v_proj")(D)
            w = jnp.concatenate([kq, kk, kv], axis=1).astype(self.dtype)
            b = jnp.concatenate([bq, bk, bv])
            qkv = ln_matmul(x, scale_ln, bias_ln, w, b, eps=eps,
                            impl="pallas")
            q, k, v = [t.reshape(B, L, H, hd)
                       for t in jnp.split(qkv, 3, axis=-1)]
        else:
            q = dense("q_proj")(x).reshape(B, L, H, hd)
            k = dense("k_proj")(x).reshape(B, L, H, hd)
            v = dense("v_proj")(x).reshape(B, L, H, hd)
        scale = hd ** -0.5
        if output_attentions or self.attention_impl == "xla":
            logits = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k)
            probs = jax.nn.softmax(logits.astype(jnp.float32),
                                   axis=-1).astype(self.dtype)
            out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, L, D)
        else:
            from concepthash_tpu.ops.attention import attention

            out = attention(q, k, v, impl=self.attention_impl).reshape(B, L, D)
            probs = None
        out = dense("out_proj")(out)
        return out, (probs if output_attentions else None)


class EncoderLayer(nn.Module):
    """Pre-LN transformer block with optional parallel adapters.

    Adapter math matches reference models/layers/adapter.py:146-170:
    ``x = residual + branch(ln(x)) + adapter(branch(ln(x)))``.
    """

    num_heads: int
    intermediate_size: int
    eps: float = 1e-5
    act: str = "quick_gelu"
    adapters: Optional[AdapterConfig] = None
    dtype: Any = jnp.float32
    attention_impl: str = "auto"
    fused_ln: str = "auto"  # 'pallas' | 'xla' | 'auto' (ops/fused_ln.py)

    @nn.compact
    def __call__(self, x, output_attentions: bool = False,
                 train: bool = False):
        from concepthash_tpu.ops.fused_ln import ln_matmul, resolve_fused_ln

        qkvo = self.adapters is not None and self.adapters.attention_qkvo
        # Whole-layer single-boundary kernel (ops/fused_layer.py): parallel
        # branch adapters run inside it; qkvo adapters, LN-less adapters and
        # attention-prob outputs need the discrete path. 'auto' takes it on
        # TPU for INFERENCE forwards only — measured (logs/r5_tpu/ab_*):
        # encode +46% plain / +32% adapters, but the train step loses 34%
        # because the custom_vjp backward recomputes the layer in XLA
        # (3,182 -> 2,101 img/s), so training keeps the XLA composition.
        want_fused_layer = self.fused_ln == "pallas_layer" or (
            self.fused_ln == "auto" and not train
            and jax.default_backend() == "tpu")
        if (want_fused_layer and not output_attentions
                and not qkvo
                and (self.adapters is None or self.adapters.layernorm_in)):
            return self._fused_layer(x), None
        # q/k/v/o adapters consume the normalized input -> fusion off there
        fused = resolve_fused_ln(self.fused_ln,
                                 x.shape[0] * x.shape[1]) and not qkvo
        fused_qkv = fused and self.fused_ln != "pallas_mlp"
        D = x.shape[-1]
        res = x
        if fused_qkv:
            scale1, bias1 = _LNParamsMirror(name="layer_norm1")(D)
            h, probs = MultiHeadAttention(self.num_heads, self.dtype,
                                          self.attention_impl,
                                          name="self_attn")(
                x, output_attentions, ln=(scale1, bias1, self.eps))
        else:
            h = nn.LayerNorm(epsilon=self.eps, dtype=self.dtype,
                             name="layer_norm1")(x)
            h, probs = MultiHeadAttention(self.num_heads, self.dtype,
                                          self.attention_impl,
                                          adapters=self.adapters if qkvo else None,
                                          name="self_attn")(h, output_attentions)
        if self.adapters is not None and self.adapters.after_attention and not qkvo:
            h = h + Adapter(self.adapters, self.dtype, name="adapter_attn")(h)
        x = res + h

        res = x
        if fused:
            scale2, bias2 = _LNParamsMirror(name="layer_norm2")(D)
            kern, b_fc = _DenseParamsMirror(self.intermediate_size,
                                            name="fc1")(D)
            h = ln_matmul(x, scale2, bias2, kern.astype(self.dtype), b_fc,
                          eps=self.eps, impl="pallas")
        else:
            h = nn.LayerNorm(epsilon=self.eps, dtype=self.dtype,
                             name="layer_norm2")(x)
            h = nn.Dense(self.intermediate_size, dtype=self.dtype,
                         name="fc1")(h)
        h = activation(self.act)(h)
        h = nn.Dense(x.shape[-1], dtype=self.dtype, name="fc2")(h)
        if self.adapters is not None and self.adapters.after_mlp and not qkvo:
            h = h + Adapter(self.adapters, self.dtype, name="adapter_mlp")(h)
        x = res + h
        return x, probs

    def _fused_layer(self, x):
        """Single pallas_call for the whole block (ops/fused_layer.py).
        Declares the SAME param tree as the discrete path (LN/Dense/Adapter
        mirrors under the same names) so checkpoints are interchangeable."""
        from concepthash_tpu.ops.fused_layer import LayerWeights, encoder_layer

        D = x.shape[-1]
        g1, b1 = _LNParamsMirror(name="layer_norm1")(D)
        attn = self._fused_attn_params(D)
        g2, b2 = _LNParamsMirror(name="layer_norm2")(D)
        k1, bf1 = _DenseParamsMirror(self.intermediate_size, name="fc1")(D)
        k2, bf2 = _DenseParamsMirror(D, name="fc2")(self.intermediate_size)
        w = LayerWeights(
            ln1_scale=g1, ln1_bias=b1,
            w_qkv=attn[0].astype(self.dtype), b_qkv=attn[1],
            w_out=attn[2].astype(self.dtype), b_out=attn[3],
            ln2_scale=g2, ln2_bias=b2,
            w_fc1=k1.astype(self.dtype), b_fc1=bf1,
            w_fc2=k2.astype(self.dtype), b_fc2=bf2)
        a1 = a2 = None
        if self.adapters is not None and self.adapters.after_attention:
            a1 = _AdapterParamsMirror(self.adapters, self.dtype,
                                      name="adapter_attn")(D)
        if self.adapters is not None and self.adapters.after_mlp:
            a2 = _AdapterParamsMirror(self.adapters, self.dtype,
                                      name="adapter_mlp")(D)
        return encoder_layer(x, w, num_heads=self.num_heads, eps=self.eps,
                             act=self.act, adapter_attn=a1, adapter_mlp=a2,
                             impl="pallas_layer")

    def _fused_attn_params(self, D):
        """q/k/v/out mirrors scoped under self_attn (checkpoint-compatible
        with MultiHeadAttention's nn.Dense modules)."""
        return _AttnParamsMirror(D, name="self_attn")()


class _AttnParamsMirror(nn.Module):
    """Param-tree twin of MultiHeadAttention's four projections; returns
    (w_qkv concatenated, b_qkv, w_out, b_out) for the fused-layer kernel."""

    D: int

    @nn.compact
    def __call__(self):
        kq, bq = _DenseParamsMirror(self.D, name="q_proj")(self.D)
        kk, bk = _DenseParamsMirror(self.D, name="k_proj")(self.D)
        kv, bv = _DenseParamsMirror(self.D, name="v_proj")(self.D)
        ko, bo = _DenseParamsMirror(self.D, name="out_proj")(self.D)
        w_qkv = jnp.concatenate([kq, kk, kv], axis=1)
        b_qkv = jnp.concatenate([bq, bk, bv])
        return w_qkv, b_qkv, ko, bo


class _AdapterParamsMirror(nn.Module):
    """Param-tree twin of Adapter (ln/down/up/scale, same names and inits —
    up is zero-init) handing the leaves to the fused-layer kernel."""

    cfg: AdapterConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, D: int):
        from concepthash_tpu.ops.fused_layer import AdapterWeights

        assert self.cfg.layernorm_in, "fused adapter requires layernorm_in"
        ln_s, ln_b = _LNParamsMirror(name="ln")(D)
        kd, bd = _DenseParamsMirror(self.cfg.bottleneck_dim, name="down")(D)
        ku, bu = _DenseParamsMirror(
            D, kernel_init=nn.initializers.zeros,
            name="up")(self.cfg.bottleneck_dim)
        scale = self.param("scale", nn.initializers.ones, (1,), jnp.float32)
        return AdapterWeights(
            ln_scale=ln_s, ln_bias=ln_b,
            w_down=kd.astype(self.dtype), b_down=bd,
            w_up=ku.astype(self.dtype), b_up=bu, scale=scale)


def _torch_bicubic_matrix(n_in: int, n_out: int, scale: float) -> "np.ndarray":
    """(n_out, n_in) interpolation matrix replaying torch
    F.interpolate(mode='bicubic', align_corners=False) exactly: cubic
    convolution kernel a=-0.75 (jax.image.resize uses Keys a=-0.5 — the
    round-1 documented mismatch, closed here), source coordinate
    (i+0.5)/scale - 0.5, edge clamping. Built in numpy at trace time —
    pos-embed resize is a one-off per compile."""
    import numpy as np

    a = -0.75

    def w(x):
        x = abs(x)
        if x <= 1:
            return (a + 2) * x ** 3 - (a + 3) * x ** 2 + 1
        if x < 2:
            return a * (x ** 3 - 5 * x ** 2 + 8 * x - 4)
        return 0.0

    m = np.zeros((n_out, n_in), np.float64)
    for i in range(n_out):
        c = (i + 0.5) / scale - 0.5
        i0 = math.floor(c)
        t = c - i0
        for k, dx in zip((i0 - 1, i0, i0 + 1, i0 + 2),
                         (1 + t, t, 1 - t, 2 - t)):
            m[i, min(max(k, 0), n_in - 1)] += w(dx)
    return m.astype(np.float32)


def resize_position_embedding(pos: jax.Array, num_patches: int) -> jax.Array:
    """Bicubic-resize the grid part of a (1+N, D) CLIP position embedding to a
    new patch count (reference models/backbone/clip.py:70-91
    _interpolate_pos_encoding): torch bicubic a=-0.75 with the dino
    +0.1-scale trick, replayed exactly via trace-time interpolation
    matrices."""
    n_old = pos.shape[0] - 1
    if n_old == num_patches:
        return pos
    side_old = int(math.sqrt(n_old))
    side_new = int(math.sqrt(num_patches))
    # reference scale_factor = (side_new + 0.1) / side_old (dino issue #8)
    scale = (side_new + 0.1) / side_old
    m = jnp.asarray(_torch_bicubic_matrix(side_old, side_new, scale))
    grid = pos[1:].reshape(side_old, side_old, -1).astype(jnp.float32)
    grid = jnp.einsum("oi,ijd->ojd", m, grid)
    grid = jnp.einsum("pj,ojd->opd", m, grid)
    grid = grid.astype(pos.dtype)
    return jnp.concatenate([pos[:1], grid.reshape(side_new * side_new, -1)], axis=0)


class ClipVisionTower(nn.Module):
    """CLIP vision transformer.

    ``__call__(pixel_values, extra_tokens=None, ...)`` where pixel_values is
    NHWC float and extra_tokens (B, M, D) are appended after the patch
    sequence (concept/hash queries — reference models/arch/coop.py:468-522).

    Returns a dict:
      last_hidden_state (B, L[+M], D)  — pre post-layernorm, like HF
      pooled (B, proj_dim)             — post_ln(cls) @ visual_projection
      cls_prenorm (B, D)
      attentions: tuple of (B, H, L, L) if output_attentions
    """

    cfg: ClipVisionConfig
    adapters: Optional[AdapterConfig] = None
    dtype: Any = jnp.float32
    # VPT: per-layer learnable position prompts added to the trailing
    # vpt_tokens positions before every encoder layer (reference
    # clip_add_myvpt_, models/layers/adapter.py:438-452; vpt_pe option of
    # LGHWithoutText, models/arch/coop.py:206-207)
    vpt_tokens: int = 0

    @nn.compact
    def __call__(self, pixel_values, extra_tokens=None,
                 output_attentions: bool = False,
                 output_hidden_states: bool = False,
                 project_extra: bool = False, train: bool = False):
        c = self.cfg
        B, Hh, Ww, C = pixel_values.shape
        p = c.patch_size
        gh, gw = Hh // p, Ww // p
        n_patches = gh * gw
        # Patch embedding as reshape + matmul instead of a stride-p conv: a
        # conv with C_in=3 wastes MXU lanes (3 padded to the 128-lane tile);
        # the equivalent (B*P, p*p*3) @ (p*p*3, D) matmul runs at full rate.
        # The parameter keeps the conv-kernel HWIO shape so HF weight ports
        # are unchanged (clip_loader.py); flattening order (ph, pw, C)
        # matches the HWIO flatten.
        patches = pixel_values.astype(self.dtype)
        patches = patches.reshape(B, gh, p, gw, p, C).transpose(0, 1, 3, 2, 4, 5)
        patches = patches.reshape(B, n_patches, p * p * C)
        emb = PatchEmbedding(c.hidden_size, p, C, c.patch_bias,
                             dtype=self.dtype, name="patch_embedding")
        x = emb(patches)

        cls = self.param("class_embedding",
                         nn.initializers.normal(0.02), (c.hidden_size,), jnp.float32)
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(self.dtype), (B, 1, c.hidden_size)), x], axis=1)

        pos = self.param("position_embedding", nn.initializers.normal(0.02),
                         (c.seq_len, c.hidden_size), jnp.float32)
        pos = resize_position_embedding(pos, n_patches).astype(self.dtype)
        x = x + pos[None]

        if extra_tokens is not None:
            x = jnp.concatenate([x, extra_tokens.astype(self.dtype)], axis=1)

        if c.use_pre_layernorm:
            x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype,
                             name="pre_layernorm")(x)

        attns = []
        hiddens = [x] if output_hidden_states else None
        layer_cls = EncoderLayer
        if c.remat and not output_attentions:
            # jax.checkpoint per layer: activations recomputed in backward
            layer_cls = nn.remat(EncoderLayer, static_argnums=(2, 3))
        for i in range(c.num_layers):
            if self.vpt_tokens:
                pe = self.param(f"vpt_pe_{i}",
                                lambda k, s: 0.02 * jax.random.normal(k, s),
                                (1, self.vpt_tokens, c.hidden_size))
                x = jnp.concatenate(
                    [x[:, :-self.vpt_tokens],
                     x[:, -self.vpt_tokens:] + pe.astype(self.dtype)], axis=1)
            x, probs = layer_cls(c.num_heads, c.intermediate_size,
                                 c.layer_norm_eps, c.hidden_act,
                                 self.adapters, self.dtype,
                                 c.attention_impl, c.fused_ln,
                                 name=f"layers_{i}")(x, output_attentions,
                                                     train)
            if output_attentions:
                attns.append(probs)
            if output_hidden_states:
                hiddens.append(x)

        cls_out = x[:, 0, :]
        post_ln = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype,
                               name="post_layernorm")
        vproj = nn.Dense(c.projection_dim, use_bias=False, dtype=self.dtype,
                         name="visual_projection")
        cls_postnorm = post_ln(cls_out)
        pooled = vproj(cls_postnorm)

        out = {"last_hidden_state": x, "pooled": pooled,
               "cls_prenorm": cls_out, "cls_postnorm": cls_postnorm}
        if project_extra and extra_tokens is not None:
            n_extra = extra_tokens.shape[1]
            out["extra_projected"] = vproj(post_ln(x[:, -n_extra:, :]))
        if output_attentions:
            out["attentions"] = tuple(attns)
        if output_hidden_states:
            out["hidden_states"] = tuple(hiddens)
        return out

class ClipTextTower(nn.Module):
    """CLIP text transformer (for the language-guided codebook, reference
    trainers/orthohash.py:94-137, and the FILIP variant).

    ``inputs_embeds`` replays the reference's
    ImageToTextTokenCLIPTextTransformer (models/backbone/clip.py:137-214):
    image embeddings enter directly as token embeddings (position embedding
    still added, causal mask kept). The reference pools that path with
    ``input_ids.argmax`` — which crashes when only embeddings are given
    (latent upstream bug); here the embeds path pools the last token.
    """

    cfg: ClipTextConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids=None, inputs_embeds=None):
        c = self.cfg
        if inputs_embeds is not None:
            B, L = inputs_embeds.shape[:2]
            emb = nn.Dense(c.hidden_size, dtype=self.dtype,
                           name="embeds_adapter")(
                inputs_embeds.astype(self.dtype)) \
                if inputs_embeds.shape[-1] != c.hidden_size \
                else inputs_embeds.astype(self.dtype)
        else:
            B, L = input_ids.shape
            emb = nn.Embed(c.vocab_size, c.hidden_size, dtype=self.dtype,
                           name="token_embedding")(input_ids)
        pos = self.param("position_embedding", nn.initializers.normal(0.02),
                         (c.max_position_embeddings, c.hidden_size), jnp.float32)
        x = emb + pos[None, :L].astype(self.dtype)

        # causal mask
        mask = jnp.tril(jnp.ones((L, L), bool))

        for i in range(c.num_layers):
            x = _CausalEncoderLayer(c.num_heads, c.intermediate_size,
                                    c.layer_norm_eps, c.hidden_act, self.dtype,
                                    name=f"layers_{i}")(x, mask)

        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype,
                         name="final_layer_norm")(x)
        # pooled = hidden state at the first eos token (HF CLIP pooling rule;
        # rows without eos fall back to position 0, matching transformers);
        # the image-token path has no eos -> pool the last position
        if input_ids is not None:
            eos_idx = jnp.argmax((input_ids == c.eos_token_id).astype(jnp.int32),
                                 axis=-1)
        else:
            eos_idx = jnp.full((B,), L - 1, jnp.int32)
        pooled = x[jnp.arange(B), eos_idx]
        proj = nn.Dense(c.projection_dim, use_bias=False, dtype=self.dtype,
                        name="text_projection")(pooled)
        return {"last_hidden_state": x, "pooled": pooled, "text_embeds": proj}


class _CausalEncoderLayer(nn.Module):
    num_heads: int
    intermediate_size: int
    eps: float
    act: str
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask):
        B, L, D = x.shape
        H = self.num_heads
        hd = D // H
        res = x
        h = nn.LayerNorm(epsilon=self.eps, dtype=self.dtype, name="layer_norm1")(x)
        dense = lambda name: nn.Dense(D, dtype=self.dtype, name=name)
        q = dense("q_proj")(h).reshape(B, L, H, hd)
        k = dense("k_proj")(h).reshape(B, L, H, hd)
        v = dense("v_proj")(h).reshape(B, L, H, hd)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q * (hd ** -0.5), k)
        logits = jnp.where(mask[None, None], logits, jnp.finfo(jnp.float32).min)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(self.dtype)
        h = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, L, D)
        h = dense("out_proj")(h)
        x = res + h
        res = x
        h = nn.LayerNorm(epsilon=self.eps, dtype=self.dtype, name="layer_norm2")(x)
        h = nn.Dense(self.intermediate_size, dtype=self.dtype, name="fc1")(h)
        h = activation(self.act)(h)
        h = nn.Dense(D, dtype=self.dtype, name="fc2")(h)
        return res + h
