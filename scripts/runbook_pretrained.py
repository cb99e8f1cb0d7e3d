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

Smoke artifacts go to logs/baseline_fill_smoke/smoke_* and
BASELINE_SMOKE_RESULTS.json — NEVER into the real baseline_fill tree (the
runs use dataset=synthetic; VERDICT r3 weak-5).

IDEMPOTENT per run (VERDICT r3 item 3): a tag already recorded in the
results JSON is skipped; a run directory holding models/last.msgpack but no
recorded result is RESUMED from its last checkpoint (resume_logdir) instead
of restarting epoch 0 — kill-and-rerun converges (rehearsed in
tests/test_runbook.py). At startup the runbook probes for an HF cache mount
(HF_HOME / ~/.cache/huggingface) and auto-skips the network fetch when the
CLIP snapshot is already present.
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


def hf_cache_available(model_id: str = "openai/clip-vit-base-patch32") -> bool:
    """True when an HF cache mount already holds the CLIP snapshot (then the
    network fetch step is unnecessary and is skipped automatically)."""
    bases = [os.environ.get("HF_HOME"),
             os.environ.get("HUGGINGFACE_HUB_CACHE"),
             os.path.expanduser("~/.cache/huggingface")]
    sub = f"models--{model_id.replace('/', '--')}"
    for b in bases:
        if not b:
            continue
        for hub in (os.path.join(b, "hub"), b):
            snap = os.path.join(hub, sub, "snapshots")
            if os.path.isdir(snap) and os.listdir(snap):
                return True
    return False


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-root", default=".",
                    help="directory containing data/<dataset>/ manifests")
    ap.add_argument("--smoke", action="store_true",
                    help="offline end-to-end check: synthetic fixture + "
                         "random-init tiny checkpoint, 1 epoch")
    ap.add_argument("--skip-fetch", action="store_true",
                    help="weights already cached: skip the network step")
    ap.add_argument("--force", action="store_true",
                    help="re-run tags even if already recorded in --out")
    ap.add_argument("--out", default=None,
                    help="results JSON (default BASELINE_RESULTS.json; "
                         "smoke mode uses BASELINE_SMOKE_RESULTS.json)")
    ap.add_argument("--smoke-data-root", default=None,
                    help="(smoke) reuse an existing synthetic fixture dir — "
                         "lets a rehearsal kill-and-rerun the same runs")
    ap.add_argument("--tags", default=None,
                    help="comma-separated subset of run tags to execute")
    args = ap.parse_args(argv)
    out = args.out or os.path.join(
        REPO, "BASELINE_SMOKE_RESULTS.json" if args.smoke
        else "BASELINE_RESULTS.json")

    if args.smoke:
        import tempfile

        from concepthash_tpu.data.synthetic import make_synthetic_dataset

        data_root = args.smoke_data_root or tempfile.mkdtemp(
            prefix="runbook_smoke_")
        if not os.path.exists(os.path.join(data_root, "data", "synthetic",
                                           "train.txt")):
            make_synthetic_dataset(os.path.join(data_root, "data",
                                                "synthetic"))
    else:
        data_root = os.path.abspath(args.data_root)
        if hf_cache_available():
            print("HF cache mount detected: skipping network fetch",
                  flush=True)
            args.skip_fetch = True
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
        cb_path = os.path.join(cub, "language_codebook.npy")
        if not os.path.exists(cb_path):  # idempotent: reuse a finished one
            subprocess.run([sys.executable,
                            os.path.join(HERE, "fetch_pretrained.py"),
                            "--codebook", cub], check=True, cwd=REPO)

    # 3+4. the BASELINE runs, results collected as they finish. Idempotent:
    # recorded tags are skipped; a dead run with a last checkpoint resumes.
    import main as cli

    results = {}
    if os.path.exists(out) and not args.force:
        with open(out) as f:
            results = json.load(f)
    fill_dir = "baseline_fill_smoke" if args.smoke else "baseline_fill"
    wanted = set(args.tags.split(",")) if args.tags else None
    for tag, overrides in RUNS:
        if wanted is not None and tag not in wanted:
            continue
        run_name = f"smoke_{tag}" if args.smoke else tag
        if results.get(run_name, {}).get("best_mAP") is not None:
            print(f"== {run_name}: already recorded "
                  f"(mAP {results[run_name]['best_mAP']:.4f}) — skipping",
                  flush=True)
            continue
        logdir = os.path.join(REPO, "logs", fill_dir, run_name)
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
        if os.path.exists(os.path.join(logdir, "models", "last.msgpack")):
            print(f"== {run_name}: resuming from {logdir}", flush=True)
            ov += [f"resume_logdir={logdir}"]
        ov += [f"data_dir={data_root}", f"logdir={logdir}"]
        print(f"== {run_name}: main.py {' '.join(ov)}", flush=True)
        best = cli.main(ov)
        results[run_name] = {"best_mAP": best, "overrides": ov}
        with open(out, "w") as f:
            json.dump(results, f, indent=2)

    print(f"\nwrote {out}")
    print("| run | best mAP |")
    print("|---|---|")
    for tag, r in results.items():
        m = r.get("best_mAP")
        print(f"| {tag} | {m:.4f} |" if m is not None else f"| {tag} | — |")
    return results


if __name__ == "__main__":
    main()
