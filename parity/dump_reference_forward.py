#!/usr/bin/env python
"""Dump a reference (torch) model's forward outputs on a seeded random batch.

Builds the reference model exactly as parity/run_reference.py composes it
(tiny parity assets), optionally loads a trained ``models/*.pth`` state_dict,
runs an eval-mode forward, and writes an .npz with the input and the outputs.
Used by tests/test_import_reference.py to verify that checkpoints imported via
concepthash_tpu.utils.torch_import reproduce the reference forward.

Usage:
  python parity/dump_reference_forward.py --method dpsh \
      [--pth parity/runs/ms/ref_dpsh_s42/models/best.pth] \
      [--save-sd /tmp/sd.pth] --out /tmp/fwd.npz
"""

from __future__ import annotations

import argparse
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REFERENCE = os.environ.get("PARITY_REFERENCE_DIR", "/root/reference")

sys.path.insert(0, os.path.join(HERE, "shims"))
sys.path.insert(1, REFERENCE)
sys.path.insert(2, HERE)

import proto  # noqa: E402

_P = proto.get()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--method", required=True)
    ap.add_argument("--pth", default=None,
                    help="trained state_dict to load (default: seeded init)")
    ap.add_argument("--save-sd", default=None,
                    help="write the model state_dict here (for import tests "
                         "against a random init)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--train-steps", type=int, default=0,
                    help="run N train-mode forwards first so BatchNorm "
                         "running stats become nontrivial before the dump")
    ap.add_argument("--backbone", default=None,
                    choices=["resnet18", "resnet50", "hfvit"],
                    help="swap the method block's CLIP backbone for a "
                         "torchvision CNN or the HF-ViT wrapper "
                         "(models/backbone/vit.py:147-159; with hfvit the "
                         "adapters stay ON and mount via the ViTModel branch "
                         "of arch/base.py:30-32 — vit_add_adapter_)")
    args = ap.parse_args()

    import compat

    compat.apply()

    import numpy as np
    import torch
    from hydra.utils import instantiate
    from omegaconf import DictConfig

    import run_reference as rr

    assets = os.path.join(HERE, _P["assets_dirname"])
    clip_dir = os.path.join(assets, "tiny-clip")
    torch.manual_seed(args.seed)
    block = rr._model_block(args.method, assets, clip_dir)
    if args.backbone == "hfvit":
        block["model"]["backbone"] = {
            "_target_": "models.backbone.vit.HuggingFaceViT",
            "name": os.path.join(assets, "tiny-vit")}
    elif args.backbone:
        tgt = {"resnet18": "models.backbone.resnet.ResNet18",
               "resnet50": "models.backbone.resnet.ResNet50"}[args.backbone]
        block["model"]["backbone"] = {"_target_": tgt, "pretrained": False}
        block["model"]["has_adapter"] = False
    model = instantiate(DictConfig(block)["model"])

    if args.pth:
        sd = torch.load(args.pth, map_location="cpu", weights_only=False)
        model.load_state_dict(sd)
    if args.train_steps:
        # Populate BatchNorm running stats with nontrivial values so the
        # import test actually proves the batch_stats mapping (a fresh init
        # has mean=0/var=1, which any garbled mapping would also produce).
        model.train()
        gt = torch.Generator().manual_seed(args.seed + 2)
        with torch.no_grad():
            for _ in range(args.train_steps):
                xb = torch.randn(args.batch, 3, _P["crop"], _P["crop"],
                                 generator=gt)
                model(xb)
    if args.save_sd:
        torch.save(model.state_dict(), args.save_sd)

    model.eval()
    g = torch.Generator().manual_seed(args.seed + 1)
    x = torch.randn(args.batch, 3, _P["crop"], _P["crop"], generator=g)

    out = {"x": x.numpy()}
    with torch.no_grad():
        res = model(x)
    if isinstance(res, tuple) and isinstance(res[-1], dict):  # coop models
        d = res[-1]
        out["codes"] = d["codes"].numpy()
        out["logits_cont"] = d["logits_cont"].numpy()
        out["logits_bin"] = d["logits_bin"].numpy()
        if "logits_concept" in d:
            out["logits_concept"] = d["logits_concept"].numpy()
    elif isinstance(res, tuple):  # (u, v) heads: ce / orthohash / gh
        out["logits"] = res[0].numpy()
        out["codes"] = res[1].numpy()
    else:  # codes-only heads: csq / dpn / pairwise (dpsh, dtsh, hashnet)
        out["codes"] = res.numpy()
    np.savez(args.out, **out)
    print("wrote", args.out, {k: tuple(v.shape) for k, v in out.items()})


if __name__ == "__main__":
    main()
