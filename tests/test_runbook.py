"""Runbook idempotency rehearsal (VERDICT r3 item 3): kill-and-rerun of
scripts/runbook_pretrained.py converges — recorded runs are skipped, a dead
run with a last checkpoint resumes from it, smoke artifacts never land in
the real baseline_fill tree."""

import importlib.util
import json
import os
import shutil

import pytest

_spec = importlib.util.spec_from_file_location(
    "runbook_pretrained", os.path.join(os.path.dirname(__file__), "..",
                                       "scripts", "runbook_pretrained.py"))
runbook = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(runbook)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TAG = "ce_cub200_64bit"  # cheapest smoke run (no concepthash text tower)


@pytest.mark.slow
def test_runbook_smoke_kill_and_rerun(tmp_path):
    out = str(tmp_path / "results.json")
    data_root = str(tmp_path / "fixture")
    logdir = os.path.join(REPO, "logs", "baseline_fill_smoke", f"smoke_{TAG}")
    shutil.rmtree(logdir, ignore_errors=True)
    argv = ["--smoke", "--out", out, "--smoke-data-root", data_root,
            "--tags", TAG]

    # run 1: completes, records the tag under a smoke_ name in a smoke out
    res1 = runbook.main(argv)
    assert f"smoke_{TAG}" in res1 and res1[f"smoke_{TAG}"]["best_mAP"] is not None
    assert os.path.exists(os.path.join(logdir, "models", "last.msgpack"))
    assert not os.path.exists(
        os.path.join(REPO, "logs", "baseline_fill", f"smoke_{TAG}"))

    # run 2 (rerun after completion): the tag is skipped — the run dir is
    # untouched (config.yaml mtime unchanged)
    mtime = os.path.getmtime(os.path.join(logdir, "config.yaml"))
    res2 = runbook.main(argv)
    assert os.path.getmtime(os.path.join(logdir, "config.yaml")) == mtime
    assert res2[f"smoke_{TAG}"] == res1[f"smoke_{TAG}"]

    # run 3 (simulated mid-run death: result record lost, checkpoint left
    # behind): the run RESUMES from its last checkpoint instead of epoch 0
    with open(out) as f:
        rec = json.load(f)
    del rec[f"smoke_{TAG}"]
    with open(out, "w") as f:
        json.dump(rec, f)
    res3 = runbook.main(argv)
    ov = res3[f"smoke_{TAG}"]["overrides"]
    assert any(o.startswith("resume_logdir=") for o in ov), ov
    assert res3[f"smoke_{TAG}"]["best_mAP"] is not None


def test_hf_cache_probe(tmp_path, monkeypatch):
    monkeypatch.setenv("HF_HOME", str(tmp_path))
    assert not runbook.hf_cache_available()
    snap = (tmp_path / "hub" / "models--openai--clip-vit-base-patch32"
            / "snapshots" / "abc123")
    snap.mkdir(parents=True)
    assert runbook.hf_cache_available()
