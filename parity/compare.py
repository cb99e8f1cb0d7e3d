#!/usr/bin/env python
"""Reference-vs-rebuild parity comparison (the evidence BASELINE.md §protocol
calls for, judged offline on the shared tiny-CLIP + synthetic assets):

1. runs both sides for each method (unless --no-run) at matched configs;
2. tabulates final/best mAP and first/last train-loss per side;
3. cross-validates retrieval scoring: the reference run's dumped codes
   (outputs/{test,db}_best.pth) are scored by BOTH the torch-side
   utils.hashing (parity/shims) and the rebuild's JAX
   ops/retrieval.calculate_mAP — they must agree to ~1e-6;
4. checks the codebook binarizers: sklearn PCA (what the reference uses,
   trainers/orthohash.py:151-157) vs the rebuild's explicit-SVD pca_fit on
   the same matrix (bit columns equal up to sign flips, which Hamming
   distances are invariant to).

Writes parity/RESULTS.json and a markdown table to stdout.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
METHODS = ["ce", "orthohash", "csq", "concepthash",
           "dpn", "hashnet", "dtsh", "greedyhash", "a2net_ce", "semicon_ce"]


def run_side(script: str, method: str, epochs: int) -> None:
    cmd = [sys.executable, os.path.join(HERE, script), "--method", method,
           "--epochs", str(epochs)]
    print(f"$ {' '.join(cmd)}", flush=True)
    subprocess.run(cmd, check=True, cwd=REPO)


def load_histories(logdir: str):
    with open(os.path.join(logdir, "train_history.json")) as f:
        train = json.load(f)
    with open(os.path.join(logdir, "test_history.json")) as f:
        test = json.load(f)
    return train, test


def cross_check_metric(ref_logdir: str) -> dict:
    """Score the reference run's dumped codes with both implementations."""
    import numpy as np
    import torch

    sys.path.insert(0, REPO)
    sys.path.insert(0, os.path.join(HERE, "shims"))
    import utils.hashing as torch_hashing

    test = torch.load(os.path.join(ref_logdir, "outputs", "test_best.pth"),
                      weights_only=False)
    db = torch.load(os.path.join(ref_logdir, "outputs", "db_best.pth"),
                    weights_only=False)
    args = (db["codes"], db["labels"], test["codes"], test["labels"])

    t_mAP, t_rec, t_prec = torch_hashing.calculate_mAP(*args, R=-1,
                                                       PRs=(1, 5, 10))

    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    from concepthash_tpu.ops.retrieval import calculate_mAP as jax_mAP

    np_args = [x.numpy() for x in args]
    j_mAP, j_rec, j_prec = jax_mAP(np_args[0], np_args[1], np_args[2],
                                   np_args[3], R=-1, PRs=(1, 5, 10))
    return {"torch_mAP": float(t_mAP), "jax_mAP": float(j_mAP),
            "mAP_abs_diff": abs(float(t_mAP) - float(j_mAP)),
            "precision_abs_diff": max(abs(a - b)
                                      for a, b in zip(t_prec, j_prec)),
            "recall_abs_diff": max(abs(a - b) for a, b in zip(t_rec, j_rec))}


def check_binarizers() -> dict:
    """sklearn PCA (reference path) vs rebuild pca_fit on the same matrix."""
    import numpy as np
    from sklearn.decomposition import PCA

    sys.path.insert(0, REPO)
    from concepthash_tpu.train.codebook import pca_fit, pca_transform

    rng = np.random.default_rng(7)
    x = rng.standard_normal((64, 32)).astype(np.float32)
    nbit = 16

    sk = PCA(n_components=nbit)
    ref_bits = np.sign(sk.fit_transform(x))

    mean, comps, scale = pca_fit(x, nbit)
    my_bits = np.sign(pca_transform(x, mean, comps, scale))

    # Hamming distance is invariant to flipping a whole bit column; align
    # column signs before comparing.
    agree = 0
    for j in range(nbit):
        col = (ref_bits[:, j] == my_bits[:, j]).mean()
        agree += max(col, 1 - col)
    return {"pca_column_agreement": float(agree / nbit)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--no-run", action="store_true")
    ap.add_argument("--fresh", action="store_true",
                    help="start RESULTS.json from scratch instead of merging "
                         "into entries from possibly-older protocol versions")
    ap.add_argument("--methods", nargs="*", default=METHODS)
    args = ap.parse_args()

    out = os.path.join(HERE, "RESULTS.json")
    results = {}
    if os.path.exists(out) and not args.fresh:
        # merge partial runs into the existing record; per-entry "stamp"
        # fields mark which protocol/epochs each row was produced under
        with open(out) as f:
            results = json.load(f)
    for m in args.methods:
        if not args.no_run:
            run_side("run_reference.py", m, args.epochs)
            run_side("run_rebuild.py", m, args.epochs)
        row = {}
        for side, prefix in (("reference", "ref"), ("rebuild", "rebuild")):
            logdir = os.path.join(HERE, "runs", f"{prefix}_{m}")
            train, test = load_histories(logdir)
            loss_key = "train_loss" if "train_loss" in train[0] else "loss"
            row[side] = {
                "best_mAP": max(h["mAP"] for h in test),
                "final_mAP": test[-1]["mAP"],
                "first_loss": train[0].get(loss_key),
                "last_loss": train[-1].get(loss_key),
                "P@10_final": test[-1]["precisions"][-1],
                "R@10_final": test[-1]["recalls"][-1],
            }
        row["mAP_gap"] = row["rebuild"]["best_mAP"] - row["reference"]["best_mAP"]
        row["stamp"] = {"epochs": args.epochs, "protocol": "compare-v2"}
        results[m] = row
        print(json.dumps({m: row}, indent=2), flush=True)

    ref_ch = os.path.join(HERE, "runs", "ref_concepthash")
    if os.path.exists(ref_ch):
        results["metric_cross_check"] = cross_check_metric(ref_ch)
    results["binarizer_check"] = check_binarizers()

    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"\nwrote {out}\n")

    print("| method | ref best mAP | rebuild best mAP | gap | ref loss "
          "(first->last) | rebuild loss (first->last) |")
    print("|---|---|---|---|---|---|")
    for m in args.methods:
        r = results[m]
        print(f"| {m} | {r['reference']['best_mAP']:.4f} | "
              f"{r['rebuild']['best_mAP']:.4f} | {r['mAP_gap']:+.4f} | "
              f"{r['reference']['first_loss']:.3f} -> "
              f"{r['reference']['last_loss']:.3f} | "
              f"{r['rebuild']['first_loss']:.3f} -> "
              f"{r['rebuild']['last_loss']:.3f} |")
    cc = results.get("metric_cross_check")
    if cc:
        print(f"\nmetric cross-check (ref codes, torch vs JAX scorer): "
              f"mAP diff {cc['mAP_abs_diff']:.2e}, "
              f"P diff {cc['precision_abs_diff']:.2e}, "
              f"R diff {cc['recall_abs_diff']:.2e}")
    print(f"binarizer: sklearn-PCA vs explicit-SVD bit agreement "
          f"{results['binarizer_check']['pca_column_agreement']:.4f}")


if __name__ == "__main__":
    main()
