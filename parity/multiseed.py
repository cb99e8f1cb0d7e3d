#!/usr/bin/env python
"""Multi-seed parity matrix (VERDICT r2 item 1).

Runs each matched reference-vs-rebuild pair at several seeds per side,
reports mean+/-std per method, and gives a variance-aware verdict: a method
"matches" when the |mean gap| is within ~2 standard errors of the cross-seed
spread (Welch-style SE with n seeds per side). Results carry per-seed arrays
and a protocol stamp (epochs, seeds, asset hash) so entries from different
protocol versions can't silently mix (ADVICE r2 item 4).

Resumable: a (method, side, seed) run whose test_history.json already exists
is not re-run. Usage:

    python parity/multiseed.py --seeds 42 43 44 [--methods greedyhash csq ...]
                               [--proto medium]

--proto selects the scale protocol (parity/proto.py): tiny is the round-2/3
72-image matrix; medium (24 classes / 480 train / nbit 32, VERDICT r3
weak-3) runs in its own assets/runs/results namespace so the two never mix.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import math
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

sys.path.insert(0, HERE)
import proto  # noqa: E402
METHODS = ["ce", "orthohash", "csq", "concepthash", "dpn", "hashnet",
           "dpsh", "dtsh", "greedyhash", "a2net_ce", "semicon_ce",
           "concepthash_sa", "adsh", "itq", "pca", "dpsh_r18", "ce_r18", "orthohash_r18"]

# shallow fits are one-pass: the reference ITQ criterion asserts if
# train_one_epoch runs a second time (models/loss/itq.py:34)
SINGLE_EPOCH = {"itq", "pca"}


def asset_stamp(assets_dir: str) -> str:
    """Hash the injected codebook/center assets so results are pinned to the
    exact matrices both sides trained against."""
    h = hashlib.sha256()
    for name in sorted(os.listdir(assets_dir)):
        p = os.path.join(assets_dir, name)
        if os.path.isfile(p) and name.endswith(".npy"):
            with open(p, "rb") as f:
                h.update(name.encode())
                h.update(f.read())
    return h.hexdigest()[:12]


def run_one(script: str, method: str, seed: int, epochs: int,
            logdir: str) -> None:
    if os.path.exists(os.path.join(logdir, "test_history.json")):
        print(f"[skip] {logdir} (already run)", flush=True)
        return
    cmd = [sys.executable, os.path.join(HERE, script), "--method", method,
           "--seed", str(seed), "--epochs", str(epochs), "--logdir", logdir]
    print(f"$ {' '.join(cmd)}", flush=True)
    subprocess.run(cmd, check=True, cwd=REPO)


def best_map(logdir: str) -> float:
    with open(os.path.join(logdir, "test_history.json")) as f:
        return max(h["mAP"] for h in json.load(f))


def mean_std(xs):
    n = len(xs)
    mu = sum(xs) / n
    var = sum((x - mu) ** 2 for x in xs) / max(n - 1, 1)
    return mu, math.sqrt(var)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, nargs="+", default=[42, 43, 44])
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--methods", nargs="*", default=METHODS)
    ap.add_argument("--no-run", action="store_true")
    ap.add_argument("--proto", choices=sorted(proto.PROTOS),
                    default=proto.name())
    args = ap.parse_args()

    os.environ["PARITY_PROTO"] = args.proto  # inherited by child runs
    P = proto.PROTOS[args.proto]
    assets_dir = os.path.join(HERE, P["assets_dirname"])
    if not os.path.isdir(assets_dir):
        print(f"assets missing — building via make_assets.py -> {assets_dir}",
              flush=True)
        subprocess.run([sys.executable,
                        os.path.join(HERE, "make_assets.py")],
                       check=True, cwd=REPO, env=os.environ)

    out_path = os.path.join(HERE, P["results_filename"])
    results = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            results = json.load(f)
    stamp = {"epochs": args.epochs, "seeds": args.seeds,
             "assets_sha": asset_stamp(assets_dir),
             "protocol": ("multiseed-v1" if args.proto == "tiny"
                          else f"multiseed-v1-{args.proto}")}
    results["stamp"] = stamp

    for m in args.methods:
        per_side = {"reference": [], "rebuild": []}
        for seed in args.seeds:
            for side, script, prefix in (
                    ("reference", "run_reference.py", "ref"),
                    ("rebuild", "run_rebuild.py", "rebuild")):
                logdir = os.path.join(HERE, "runs", P["runs_subdir"],
                                      f"{prefix}_{m}_s{seed}")
                if not args.no_run:
                    run_one(script, m, seed,
                            1 if m in SINGLE_EPOCH else args.epochs, logdir)
                per_side[side].append(best_map(logdir))

        ref_mu, ref_sd = mean_std(per_side["reference"])
        reb_mu, reb_sd = mean_std(per_side["rebuild"])
        n = len(args.seeds)
        gap = reb_mu - ref_mu
        se = math.sqrt(ref_sd ** 2 / n + reb_sd ** 2 / n)
        # Welch-style 2-SE check; floor the SE at 0.01 mAP so a pair of
        # degenerate zero-variance runs (both sides saturated at 1.0) can't
        # flag a trivial 0.001 gap as significant.
        within = abs(gap) <= 2 * max(se, 0.01)
        results[m] = {
            "reference": {"per_seed": per_side["reference"],
                          "mean": ref_mu, "std": ref_sd},
            "rebuild": {"per_seed": per_side["rebuild"],
                        "mean": reb_mu, "std": reb_sd},
            "gap_mean": gap, "gap_se": se,
            "verdict": ("match_within_spread" if within
                        else ("rebuild_ahead" if gap > 0 else "rebuild_behind")),
            # per-method stamp: SINGLE_EPOCH methods run 1 epoch regardless
            # of --epochs (the reference ITQ criterion asserts on a second
            # fit) — recording args.epochs for them would misdescribe the
            # protocol anyone reproduces from this file
            "stamp": {**stamp,
                      "epochs": 1 if m in SINGLE_EPOCH else args.epochs},
        }
        print(json.dumps({m: results[m]}, indent=2), flush=True)
        with open(out_path, "w") as f:   # checkpoint after every method
            json.dump(results, f, indent=2)

    print(f"\nwrote {out_path}\n")
    print("| method | ref mAP (mean+/-std) | rebuild mAP (mean+/-std) "
          "| gap | verdict |")
    print("|---|---|---|---|---|")
    for m in args.methods:
        r = results[m]
        print(f"| {m} | {r['reference']['mean']:.4f}+/-"
              f"{r['reference']['std']:.4f} | {r['rebuild']['mean']:.4f}+/-"
              f"{r['rebuild']['std']:.4f} | {r['gap_mean']:+.4f} | "
              f"{r['verdict']} |")


if __name__ == "__main__":
    main()
