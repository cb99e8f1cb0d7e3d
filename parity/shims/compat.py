"""transformers>=4.5x compatibility patches for running the reference
(written against ~4.3x) unmodified:

- modeling_clip lost the docstring-decorator re-exports the reference
  imports at models/backbone/clip.py:7-18 -> provide no-op equivalents.
- CLIPEncoder.forward lost its ``return_dict`` kwarg (reference
  models/arch/coop.py:473-479 passes it) -> wrap to swallow it.
- sdpa attention can't materialize attention maps; the reference requests
  ``output_attentions=True`` on every forward (coop.py:476) -> force the
  eager implementation at from_pretrained time.
"""

from __future__ import annotations

import inspect
import typing


def apply():
    import transformers
    import transformers.models.clip.modeling_clip as mc

    if not hasattr(mc, "add_start_docstrings_to_model_forward"):
        mc.add_start_docstrings_to_model_forward = lambda *a, **k: (lambda f: f)
    if not hasattr(mc, "replace_return_docstrings"):
        mc.replace_return_docstrings = lambda *a, **k: (lambda f: f)
    if not hasattr(mc, "CLIP_TEXT_INPUTS_DOCSTRING"):
        mc.CLIP_TEXT_INPUTS_DOCSTRING = ""
    if not hasattr(mc, "Tuple"):
        mc.Tuple = typing.Tuple

    # The reference replaces CLIPVisionEmbeddings.forward class-wide with a
    # (self, pixel_values) signature (models/backbone/clip.py:92-104,120);
    # transformers>=4.5x calls embeddings(pixel_values,
    # interpolate_pos_encoding=...). Re-pin the vision transformer forward to
    # the classic call shape (positional pixel_values only) — behaviorally
    # identical for both the stock and the reference-patched embeddings.
    def _vision_forward(self, pixel_values=None, output_attentions=None,
                        output_hidden_states=None,
                        interpolate_pos_encoding=False, return_dict=None,
                        **kwargs):
        from transformers.modeling_outputs import BaseModelOutputWithPooling

        hidden_states = self.embeddings(pixel_values)
        hidden_states = self.pre_layrnorm(hidden_states)
        encoder_outputs = self.encoder(
            inputs_embeds=hidden_states,
            output_attentions=output_attentions,
            output_hidden_states=output_hidden_states)
        last_hidden_state = encoder_outputs.last_hidden_state
        pooled_output = self.post_layernorm(last_hidden_state[:, 0, :])
        return BaseModelOutputWithPooling(
            last_hidden_state=last_hidden_state, pooler_output=pooled_output,
            hidden_states=encoder_outputs.hidden_states,
            attentions=encoder_outputs.attentions)

    mc.CLIPVisionTransformer.forward = _vision_forward

    if "return_dict" not in inspect.signature(mc.CLIPEncoder.forward).parameters:
        orig = mc.CLIPEncoder.forward

        def forward(self, *args, return_dict=True, **kwargs):
            return orig(self, *args, **kwargs)

        mc.CLIPEncoder.forward = forward

    # --- HF ViT: the reference's ViTLayerWithAdapter (adapter.py:341-396)
    # targets the old tuple API. transformers 4.5x ViTAttention.forward is
    # (hs, head_mask) -> Tensor and ViTEncoder feeds layer outputs straight
    # into the next layer as tensors. Two surgical patches restore the old
    # call shapes ONLY where the adapter classes exercise them: attention
    # returns a tuple iff output_attentions was explicitly passed (the
    # adapter layer always passes it; the stock layer never does), and the
    # encoder unwraps tuple-returning layers.
    import transformers.models.vit.modeling_vit as mv

    if not getattr(mv.ViTAttention.forward, "_parity_tuple", False):
        _orig_vit_attn = mv.ViTAttention.forward
        _MISSING = object()

        def _attn_forward(self, hidden_states, head_mask=None,
                          output_attentions=_MISSING):
            out = _orig_vit_attn(self, hidden_states, head_mask)
            return out if output_attentions is _MISSING else (out,)

        _attn_forward._parity_tuple = True
        mv.ViTAttention.forward = _attn_forward

    if not getattr(mv.ViTEncoder.forward, "_parity_tuple", False):
        def _enc_forward(self, hidden_states, head_mask=None, **kwargs):
            from transformers.modeling_outputs import BaseModelOutput

            for i, layer_module in enumerate(self.layer):
                lhm = head_mask[i] if head_mask is not None else None
                out = layer_module(hidden_states, lhm)
                hidden_states = out[0] if isinstance(out, tuple) else out
            return BaseModelOutput(last_hidden_state=hidden_states)

        _enc_forward._parity_tuple = True
        mv.ViTEncoder.forward = _enc_forward

    for cls_name in ("CLIPModel", "CLIPVisionModel"):
        cls = getattr(transformers, cls_name)
        if getattr(cls.from_pretrained, "_parity_eager", False):
            continue
        orig_fp = cls.from_pretrained.__func__

        def make(orig_fp):
            def from_pretrained(c, *a, **k):
                k.setdefault("attn_implementation", "eager")
                return orig_fp(c, *a, **k)

            from_pretrained._parity_eager = True
            return classmethod(from_pretrained)

        cls.from_pretrained = make(orig_fp)
