#!/usr/bin/env python
"""ONE-COMMAND pretrained-weights runbook (VERDICT r2 item 3): the moment
this container has network (or an HF cache mount), this fills BASELINE.md's
TBD mAP rows:

    python scripts/runbook_pretrained.py --data-root <datasets root>

does, in order:
  1. fetch openai/clip-vit-base-patch32 + activation-parity port check
     (scripts/fetch_pretrained.py --verify);
  2. regenerate the language-guided codebook from the dataset's
     class_names.txt through the real CLIP text tower;
  3. run ConceptHash 16/64-bit + two baselines (orthohash, ce) on CUB-200
     (reference README.md:8 protocol: sgd lr 1e-3, bs 32, csw warmup,
     100 epochs, frozen backbone + adapters);
  4. collect each run's best mAP into BASELINE_RESULTS.json and print the
     rows to paste into BASELINE.md.

Offline --smoke mode drives the IDENTICAL code path on the synthetic fixture
with the random-init tiny checkpoint (codebook falls back to the
deterministic offline embedder, loudly logged) so the runbook itself stays
continuously tested in zero-egress rounds:

    python scripts/runbook_pretrained.py --smoke
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

RUNS = [
    # (tag, overrides) — the BASELINE.md protocol rows
    ("concepthash_cub200_64bit", ["dataset=cub200", "model=concepthash",
                                  "optim=sgd", "model.nbit=64"]),
    ("concepthash_cub200_16bit", ["dataset=cub200", "model=concepthash",
                                  "optim=sgd", "model.nbit=16"]),
    ("orthohash_cub200_64bit", ["dataset=cub200", "model=orthohash_adapter",
                                "optim=sgd", "model.nbit=64"]),
    ("ce_cub200_64bit", ["dataset=cub200", "model=ce_adapter",
                         "optim=sgd", "model.nbit=64"]),
]

SMOKE_OVERRIDES = [
    "dataset=synthetic", "backbone=tiny_test", "model.nbit=16",
    "batch_size=8", "epochs=1", "eval_interval=1",
    "model.adapter_bottleneck_dim=8",
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-root", default=".",
                    help="directory containing data/<dataset>/ manifests")
    ap.add_argument("--smoke", action="store_true",
                    help="offline end-to-end check: synthetic fixture + "
                         "random-init tiny checkpoint, 1 epoch")
    ap.add_argument("--skip-fetch", action="store_true",
                    help="weights already cached: skip the network step")
    ap.add_argument("--out", default=os.path.join(REPO,
                                                  "BASELINE_RESULTS.json"))
    args = ap.parse_args()

    if args.smoke:
        import tempfile

        from concepthash_tpu.data.synthetic import make_synthetic_dataset

        data_root = tempfile.mkdtemp(prefix="runbook_smoke_")
        make_synthetic_dataset(os.path.join(data_root, "data", "synthetic"))
    else:
        data_root = os.path.abspath(args.data_root)
        if not args.skip_fetch:
            # 1. fetch + port parity check — hard-fails before any training
            subprocess.run([sys.executable,
                            os.path.join(HERE, "fetch_pretrained.py"),
                            "--verify"], check=True, cwd=REPO)

    # 2. language codebook regeneration (offline smoke: the deterministic
    # fallback embedder inside the codebook stage logs loudly and proceeds)
    cb_path = None
    if not args.smoke:
        cub = os.path.join(data_root, "data", "cub200_2011")
        subprocess.run([sys.executable,
                        os.path.join(HERE, "fetch_pretrained.py"),
                        "--codebook", cub], check=True, cwd=REPO)
        cb_path = os.path.join(cub, "language_codebook.npy")

    # 3+4. the BASELINE runs, results collected as they finish
    import main as cli

    results = {}
    for tag, overrides in RUNS:
        logdir = os.path.join(REPO, "logs", "baseline_fill", tag)
        ov = list(overrides)
        if args.smoke:
            ov = [o for o in ov if not o.startswith("dataset=")]
            ov += SMOKE_OVERRIDES
            if "concepthash" in tag:
                ov += ["model.text_projection_dims=[32]"]
        else:
            ov += ["backbone.pretrained=true", "epochs=100", "batch_size=32"]
            if "concepthash" in tag and cb_path:
                ov += ["model.fixed_center.codebook_method=file",
                       f"model.fixed_center.path={cb_path}",
                       "model.fixed_center.quantized=false"]
        ov += [f"data_dir={data_root}", f"logdir={logdir}"]
        print(f"== {tag}: main.py {' '.join(ov)}", flush=True)
        best = cli.main(ov)
        results[tag] = {"best_mAP": best, "overrides": ov}
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)

    print(f"\nwrote {args.out}")
    print("| run | best mAP |")
    print("|---|---|")
    for tag, r in results.items():
        print(f"| {tag} | {r['best_mAP']:.4f} |")


if __name__ == "__main__":
    main()
