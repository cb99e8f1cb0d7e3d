#!/usr/bin/env python
"""Network-enabled round: fetch real CLIP weights, verify the port, regenerate
the language-guided codebook, and print the exact BASELINE.md runs.

This container has zero egress, so this script is the committed CONTINGENCY
RECIPE (VERDICT.md round-1 item 9): the moment a round has network (or an HF
cache mount), one command fills the BASELINE.md TBD rows.

    python scripts/fetch_pretrained.py --verify          # fetch + port-check
    python scripts/fetch_pretrained.py --codebook data/cub200_2011
    python scripts/fetch_pretrained.py --print-runs      # the BASELINE runs

Expected artifacts (for integrity checking after fetch):
- openai/clip-vit-base-patch32: 12-layer ViT-B/32 vision tower
  (hidden 768, mlp 3072, 224px, patch 32, proj 512) + 12-layer text tower
  (hidden 512, vocab 49408). ~151M params total, ~605MB fp32 safetensors.
  HF repo revision pinning: pass --revision to from_pretrained if needed.
- Port check: per-layer activation max-abs-diff < 2e-4 fp32 on random input
  (the same tolerance tests/test_clip_port.py enforces on tiny geometries).
"""

from __future__ import annotations

import argparse
import sys

MODEL_ID = "openai/clip-vit-base-patch32"

BASELINE_RUNS = """\
# Rebuild side (this repo), per BASELINE.md protocol (seed 42, bs 32, sgd
# lr 1e-3, csw warmup 10, 100 epochs, frozen backbone + adapters):
python main.py dataset=cub200 model=concepthash optim=sgd model.nbit=64 \\
    backbone=clip_b32 backbone.pretrained=true data_dir=<datasets root>
python main.py dataset=cub200 model=concepthash optim=sgd model.nbit=16 ...
python main.py dataset=cars196 model=concepthash optim=sgd model.nbit=32 ...
python main.py dataset=aircraft model=concepthash optim=sgd model.nbit=64 ...
python main.py dataset=food101 model=concepthash optim=sgd model.nbit=64 ...
python main.py dataset=nabirds model=concepthash optim=sgd model.nbit=64 ...
# Baseline zoo rows: model={ce_adapter,orthohash_adapter,csq_adapter,
#   hashnet_adapter,dpn_adapter,dtsh_adapter,sgh_adapter,semicon_ce_adapter,
#   a2net_ce_adapter,itq} with the same dataset/nbit grid.
# Reference side (torch, /root/reference) for the same rows:
python /root/reference/main_v2.py dataset=cub200 \\
    model=concept_hash_final_v1_nosa_apt optim=sgd model.nbit=64
#   (reference needs hydra/omegaconf/torchvision/wandb + the utils shims —
#    parity/shims provides everything; see parity/run_reference.py)
# Each run's best mAP lands in <logdir>/test_history.json; copy into
# BASELINE.md's table. Image datasets themselves follow the manifest paths in
# /root/reference/data/<ds>/{train,test,database}.txt (not bundled upstream;
# the dataset_preparation.ipynb notebooks document how to lay them out).
"""


def fetch_and_verify():
    import numpy as np

    from transformers import CLIPModel

    print(f"fetching {MODEL_ID} ...")
    hf = CLIPModel.from_pretrained(MODEL_ID)
    n = sum(p.numel() for p in hf.parameters())
    print(f"fetched: {n / 1e6:.1f}M params")

    import jax
    import jax.numpy as jnp

    from concepthash_tpu.models.clip import ClipVisionTower
    from concepthash_tpu.models.clip_loader import (
        merge_ported,
        vision_config_from_hf,
        vision_params_from_torch,
    )

    vcfg = vision_config_from_hf(hf.config.vision_config)
    tower = ClipVisionTower(vcfg)
    imgs = np.random.default_rng(0).standard_normal((2, 224, 224, 3)).astype("float32")
    init = tower.init(jax.random.PRNGKey(0), jnp.asarray(imgs))["params"]
    params = merge_ported(init, vision_params_from_torch(
        hf.state_dict(), vcfg.num_layers))
    ours = np.asarray(tower.apply({"params": params}, jnp.asarray(imgs))["pooled"])

    import torch

    with torch.no_grad():
        theirs = hf.vision_model(
            torch.from_numpy(imgs).permute(0, 3, 1, 2)).pooler_output.numpy()
    diff = np.abs(ours - theirs).max()
    print(f"port check: pooled-output max-abs-diff = {diff:.2e} "
          f"({'OK' if diff < 2e-4 else 'FAIL'})")
    return diff < 2e-4


def regenerate_codebook(data_folder: str):
    import os

    import numpy as np

    from concepthash_tpu.data.manifest import read_class_names
    from concepthash_tpu.train.codebook import get_codebook

    names = read_class_names(data_folder)
    cb = get_codebook("L", nclass=len(names), nbit=64, class_names=names,
                      model_id=MODEL_ID, binary_method="pca", quantized=False)
    out = os.path.join(data_folder, "language_codebook.npy")
    np.save(out, cb)
    print(f"language codebook ({cb.shape}) -> {out}; wire it with "
          f"model.fixed_center.codebook_method=file model.fixed_center.path={out}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--verify", action="store_true")
    ap.add_argument("--codebook", metavar="DATA_FOLDER")
    ap.add_argument("--print-runs", action="store_true")
    args = ap.parse_args()
    if args.print_runs or not (args.verify or args.codebook):
        print(BASELINE_RUNS)
    if args.verify:
        ok = fetch_and_verify()
        sys.exit(0 if ok else 1)
    if args.codebook:
        regenerate_codebook(args.codebook)


if __name__ == "__main__":
    main()
