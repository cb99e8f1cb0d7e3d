#!/usr/bin/env python
"""Run the REBUILD (this repo's main.py, JAX on CPU) on the same parity
assets, config-matched to parity/run_reference.py: same tiny CLIP checkpoint
(ported weights -> identical backbone init), same injected center/codebook
matrices, same data/manifests, same bs/lr/schedule/epochs/seed.

Usage: python parity/run_rebuild.py --method {ce,orthohash,csq,concepthash}
"""

from __future__ import annotations

import argparse
import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

sys.path.insert(0, HERE)
import proto  # noqa: E402  (scale knobs; PARITY_PROTO env selects)

_P = proto.get()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--method", required=True,
                    choices=["ce", "orthohash", "csq", "concepthash",
                             "dpn", "hashnet", "dpsh", "dtsh", "greedyhash",
                             "a2net_ce", "semicon_ce", "concepthash_sa",
                             "adsh", "semicon", "itq", "pca",
                             "dpsh_r18", "ce_r18", "orthohash_r18"])
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--assets",
                    default=os.path.join(HERE, _P["assets_dirname"]))
    ap.add_argument("--logdir", default=None)
    args = ap.parse_args()

    # force CPU before any jax backend init (tests/conftest.py semantics)
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

    assets = os.path.abspath(args.assets)
    clip_dir = os.path.join(assets, "tiny-clip")
    logdir = args.logdir or os.path.join(HERE, "runs", f"rebuild_{args.method}")

    # "<method>_r18" = the same method block over a random-init trainable
    # ResNet18 (CNN-family trained row); overrides key on the base name.
    base = args.method[:-4] if args.method.endswith("_r18") else args.method
    model_group = {"ce": "ce_adapter", "orthohash": "orthohash_adapter",
                   "csq": "csq_adapter", "concepthash": "concepthash",
                   "dpn": "dpn_adapter", "hashnet": "hashnet_adapter",
                   "dpsh": "dpsh_adapter",
                   "dtsh": "dtsh_adapter",
                   "greedyhash": "sgh_adapter",
                   "a2net_ce": "a2net_ce_adapter",
                   "semicon_ce": "semicon_ce_adapter",
                   "concepthash_sa": "concepthash_sa",
                   "adsh": "adsh", "semicon": "semicon",
                   "itq": "itq", "pca": "pca"}[base]

    if args.method.endswith("_r18"):
        # CNN-backbone row: random-init trainable ResNet18 on both sides
        # (run_reference.py compose; no adapters, backbone at full lr)
        backbone_ov = ["backbone=resnet18", "model.has_adapter=false",
                       "backbone_lr_scale=1"]
    else:
        backbone_ov = ["backbone=tiny_test",
                       f"backbone.name={clip_dir}", "backbone.pretrained=true"]

    # group order matters: the model group's defaults override /backbone,
    # so the explicit backbone selection must come after model=
    overrides = [
        "dataset=synthetic", f"model={model_group}",
    ] + backbone_ov + [
        "optim=sgd", "transforms=test",
        f"model.nbit={_P['nbit']}", f"dataset.nclass={_P['nclass']}",
        f"batch_size={_P['batch_size']}", f"epochs={args.epochs}",
        "eval_interval=10",
        f"seed={args.seed}",
        f"scheduler.warmup_epochs={max(args.epochs // 10, 1)}",
        "model.adapter_bottleneck_dim=8",
        f"data_dir={assets}", f"logdir={logdir}",
    ]
    if base in ("concepthash", "concepthash_sa"):
        if base == "concepthash_sa":
            overrides += ["model.self_attn_at_last.mask_sigma=0"]
        overrides += [
            "model.text_projection_dims=[32]",
            "model.fixed_center.codebook_method=file",
            f"model.fixed_center.path={assets}/center.npy",
            "model.fixed_center.quantized=false",
        ]
    elif base == "orthohash":
        overrides += [
            "model.codebook.codebook_method=file",
            f"model.codebook.path={assets}/codebook_N.npy",
        ]
    elif base == "csq":
        overrides += [
            "criterion.codebook.codebook_method=file",
            f"criterion.codebook.path={assets}/codebook_H.npy",
        ]
    elif base == "dpn":
        overrides += [
            "criterion.codebook.codebook_method=file",
            f"criterion.codebook.path={assets}/codebook_B.npy",
        ]
    elif base in ("adsh", "semicon"):
        # match run_reference's adsh-regime method_params
        overrides += [f"criterion.num_samples={_P['adsh_num_samples']}",
                      "criterion.max_iters=3"]
    elif base == "itq":
        # match the reference ITQLoss defaults (max_iters=3) and tie the
        # rotation init to the run seed like upstream's global torch seed
        overrides += ["criterion.iters=3", f"criterion.seed={args.seed}"]

    sys.path.insert(0, REPO)
    import main as cli

    best = cli.main(overrides)

    with open(os.path.join(logdir, "test_history.json")) as f:
        hist = json.load(f)
    print(json.dumps({"method": args.method, "side": "rebuild",
                      "best_mAP": max(h["mAP"] for h in hist),
                      "final_mAP": hist[-1]["mAP"]}))


if __name__ == "__main__":
    main()
