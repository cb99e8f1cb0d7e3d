#!/usr/bin/env python
"""Generate the shared parity assets:

- a randomly-initialized tiny HF CLIP checkpoint (torch, save_pretrained)
  with EXACTLY the geometry of configs/backbone/tiny_test.yaml, so the
  reference loads it via from_pretrained and the rebuild ports the same
  weights via clip_loader -> both sides start from IDENTICAL backbone
  weights (pretrained real CLIP needs network; SURVEY.md §6);
- a synthetic dataset in the reference manifest format;
- shared center/codebook matrices (seeded) injected into both sides.

Scale comes from the PARITY_PROTO env (parity/proto.py): tiny (default,
the round-2/3 protocol) or medium (24 classes / 480 train imgs / nbit 32).

Run: [PARITY_PROTO=medium] python parity/make_assets.py [--out parity/<assets>]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import proto

P = proto.get()
NCLASS = P["nclass"]
NBIT = P["nbit"]
PROJ_DIM = P["proj_dim"]


def make_tiny_clip(out_dir: str):
    import torch
    from transformers import CLIPConfig, CLIPModel

    cfg = CLIPConfig(
        projection_dim=PROJ_DIM,
        text_config={"hidden_size": 32, "intermediate_size": 64,
                     "num_hidden_layers": 2, "num_attention_heads": 4,
                     "vocab_size": 1000, "max_position_embeddings": 77,
                     "projection_dim": PROJ_DIM},
        vision_config={"hidden_size": 64, "intermediate_size": 128,
                       "num_hidden_layers": 2, "num_attention_heads": 4,
                       "image_size": 48, "patch_size": 8,
                       "projection_dim": PROJ_DIM},
    )
    torch.manual_seed(0)
    model = CLIPModel(cfg)
    model.save_pretrained(out_dir)
    n = sum(p.numel() for p in model.parameters())
    print(f"tiny CLIP checkpoint: {out_dir} ({n / 1e6:.2f}M params)")


def make_tiny_vit(out_dir: str):
    """Random-init tiny HF ViTModel with the tiny_test tower geometry —
    the weights behind the reference's HuggingFaceViT backbone family
    (models/backbone/vit.py:147-159), used by the ViT-adapter import test."""
    import torch
    from transformers import ViTConfig, ViTModel

    cfg = ViTConfig(hidden_size=64, intermediate_size=128,
                    num_hidden_layers=2, num_attention_heads=4,
                    image_size=48, patch_size=8)
    torch.manual_seed(7)
    model = ViTModel(cfg)
    model.save_pretrained(out_dir)
    n = sum(p.numel() for p in model.parameters())
    print(f"tiny ViT checkpoint: {out_dir} ({n / 1e6:.2f}M params)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), P["assets_dirname"]))
    args = ap.parse_args()
    out = os.path.abspath(args.out)
    os.makedirs(out, exist_ok=True)

    make_tiny_clip(os.path.join(out, "tiny-clip"))
    make_tiny_vit(os.path.join(out, "tiny-vit"))

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from concepthash_tpu.data.synthetic import make_synthetic_dataset

    make_synthetic_dataset(os.path.join(out, "data", "synthetic"),
                           nclass=NCLASS, per_class_train=P["per_class_train"],
                           per_class_test=P["per_class_test"],
                           image_size=P["image_size"], seed=0)
    print(f"synthetic dataset: {out}/data/synthetic "
          f"({NCLASS} classes, {NCLASS * P['per_class_train']} train / "
          f"{NCLASS * P['per_class_test']} test)")

    rng = np.random.default_rng(123)
    center = rng.standard_normal((NCLASS, PROJ_DIM)).astype(np.float32)
    np.save(os.path.join(out, "center.npy"), center)

    cb_n = np.sign(rng.standard_normal((NCLASS, NBIT))).astype(np.float32)
    cb_n[cb_n == 0] = 1.0
    np.save(os.path.join(out, "codebook_N.npy"), cb_n)

    # Hadamard rows (CSQ recipe) — deterministic, shared verbatim. Beyond
    # nbit rows the reference stacks -H, and beyond 2*nbit it fills with
    # balanced random +-1 rows (half the bits flipped; reference
    # trainers/orthohash.py get_hadamard "copy from CSQ") — seeded here so
    # both sides train against the identical matrix (the large proto's 200
    # classes exhaust the 128-row [H; -H] stack at nbit 64).
    from scipy.linalg import hadamard

    h = hadamard(NBIT).astype(np.float32)
    h2 = np.concatenate([h, -h], 0)
    if NCLASS > len(h2):
        extra = np.ones((NCLASS - len(h2), NBIT), np.float32)
        for i in range(len(extra)):
            extra[i, rng.choice(NBIT, NBIT // 2, replace=False)] = -1.0
        h2 = np.concatenate([h2, extra], 0)
    np.save(os.path.join(out, "codebook_H.npy"), h2[:NCLASS])

    # Bernoulli +-1 codebook (DPN's 'B' recipe, ref orthohash.py:68-70)
    cb_b = (rng.random((NCLASS, NBIT)) < 0.5).astype(np.float32) * 2 - 1
    np.save(os.path.join(out, "codebook_B.npy"), cb_b)
    print(f"shared center ({center.shape}) + codebooks ({cb_n.shape}) saved")


if __name__ == "__main__":
    main()
