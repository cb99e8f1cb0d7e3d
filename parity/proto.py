"""Parity protocol registry: the scale knobs shared by make_assets /
run_reference / run_rebuild / multiseed.

Two protocols (VERDICT r3 weak-3 — the tiny 72-image matrix cannot detect
subtle quality regressions that need more classes/bits to show):

- ``tiny``   — the round-2/3 protocol, unchanged (6 classes, 72 train
  images, nbit 16). Kept byte-identical so round-3 results remain
  reproducible/resumable.
- ``medium`` — 24 classes x 20 train images = 480 train / 192 test /
  480 db at nbit 32. Chance mAP ~1/24 and 24 of 32 Hadamard rows used, so
  neither side saturates at 1.0 — method-quality gaps that the tiny
  protocol hides inside ties become visible. The backbone stays the tiny
  CLIP tower: scale lives in the DATA/CODE SPACE, which is what drives
  hashing-loss geometry; a bigger tower would only multiply CPU cost.
- ``large``  — the flagship's CANONICAL geometry (VERDICT r4 task 2 /
  weak-3): 200 classes / nbit 64 / ncontext 4 -> 16-bit sub-codes and
  batch 32, matching the reference's headline run
  (/root/reference/configs/model/concept_hash_final_v1_nosa_apt.yaml) so
  class-count-dependent machinery (BN over 200-way logits, concept CE,
  the 200-row codebooks, Hadamard exhaustion at nclass > 2*nbit) is
  exercised offline at real scale. 10 train / 3 test images per class
  (2,000 train / 600 query / 2,000 db) keeps a 30-epoch run tractable on
  the 1-core box; the tower stays tiny for the same reason as medium.

Selected via the PARITY_PROTO env var (child runs inherit it) or the
--proto flag on multiseed.py.
"""

from __future__ import annotations

import os

PROTOS = {
    "tiny": dict(
        nclass=6, nbit=16, proj_dim=32,
        per_class_train=12, per_class_test=6, image_size=64,
        resize=64, crop=48, batch_size=12,
        adsh_num_samples=48,
        assets_dirname="assets",
        runs_subdir="ms",                      # round-3 layout, resumable
        results_filename="RESULTS_MULTISEED.json",
    ),
    "medium": dict(
        nclass=24, nbit=32, proj_dim=32,
        per_class_train=20, per_class_test=8, image_size=64,
        resize=64, crop=48, batch_size=24,
        adsh_num_samples=160,
        assets_dirname="assets_medium",
        runs_subdir="ms_medium",
        results_filename="RESULTS_MULTISEED_MEDIUM.json",
    ),
    "large": dict(
        nclass=200, nbit=64, proj_dim=32,
        per_class_train=10, per_class_test=3, image_size=64,
        resize=64, crop=48, batch_size=32,
        adsh_num_samples=400,
        assets_dirname="assets_large",
        runs_subdir="ms_large",
        results_filename="RESULTS_MULTISEED_LARGE.json",
    ),
}


def name() -> str:
    return os.environ.get("PARITY_PROTO", "tiny")


def get() -> dict:
    return PROTOS[name()]
