"""End-to-end: CLI config -> train -> eval -> artifacts -> validation reload.

The CPU-runnable equivalent of the reference's README run command
(BASELINE.json configs[0]), on the synthetic fixture with the tiny backbone.
"""

import json
import os

import numpy as np
import pytest

from concepthash_tpu.data.synthetic import make_synthetic_dataset


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    wd = tmp_path_factory.mktemp("e2e")
    make_synthetic_dataset(str(wd / "data" / "synthetic"), nclass=3,
                           per_class_train=8, per_class_test=4, image_size=64)
    return str(wd)


def run_main(args):
    import main as cli

    return cli.main(args)


@pytest.fixture(scope="module")
def trained_run(workdir):
    logdir = os.path.join(workdir, "run1")
    best = run_main([
        "dataset=synthetic", "model=concepthash", "backbone=tiny_test",
        "optim=sgd", "model.nbit=16", "model.text_projection_dims=[32]",
        "batch_size=8", "epochs=2", "eval_interval=1",
        f"data_dir={workdir}", f"logdir={logdir}", "seed=7",
        "scheduler.warmup_epochs=1", "wandb=true",
    ])
    return logdir, best


def test_train_produces_artifacts(trained_run):
    logdir, best = trained_run
    assert best is not None and 0.0 <= best <= 1.0
    for f in ["config.yaml", "log.txt", "train_history.json",
              "test_history.json", os.path.join("models", "best.msgpack"),
              os.path.join("models", "last.msgpack"),
              os.path.join("outputs", "test_best.msgpack")]:
        assert os.path.exists(os.path.join(logdir, f)), f"missing {f}"
    with open(os.path.join(logdir, "train_history.json")) as f:
        hist = json.load(f)
    assert len(hist) == 2
    assert "loss" in hist[0] and "lr" in hist[0]
    with open(os.path.join(logdir, "test_history.json")) as f:
        thist = json.load(f)
    assert thist[-1]["mAP"] == pytest.approx(best) or thist[0]["mAP"] == pytest.approx(best)
    assert len(thist[-1]["recalls"]) == 3
    # wandb=true gates the JSONL event tracker (reference wandb surface,
    # train_helper.py:125-139 — local emitter, no credentials)
    with open(os.path.join(logdir, "events.jsonl")) as f:
        events = [json.loads(l) for l in f]
    assert any("train/loss" in e for e in events)
    assert any("test/mAP" in e for e in events)


def test_validation_mode_reloads_config(trained_run, workdir):
    logdir, best = trained_run
    eval_dir = os.path.join(workdir, "eval1")
    res = run_main([
        "exp=validation", f"logdir={logdir}", f"data_dir={workdir}",
        f"eval_logdir={eval_dir}", "batch_size=8", "R=-1",
    ])
    assert "mAP" in res
    assert os.path.exists(os.path.join(eval_dir, "history.json"))
    # best-checkpoint mAP should reproduce the training-time best
    assert res["mAP"] == pytest.approx(best, abs=0.02)


def test_validation_list_R(trained_run, workdir):
    """R as a LIST (reference inat_birds eval semantics: R=1000, and the
    calculate_mAP list-R contract, SURVEY.md §2.6) through the CLI: one mAP
    per cutoff, persisted to history.json."""
    logdir, _ = trained_run
    eval_dir = os.path.join(workdir, "eval_listR")
    res = run_main([
        "exp=validation", f"logdir={logdir}", f"data_dir={workdir}",
        f"eval_logdir={eval_dir}", "batch_size=8", "R=[1,5]",
    ])
    assert isinstance(res["mAP"], list) and len(res["mAP"]) == 2
    assert all(0.0 <= m <= 1.0 for m in res["mAP"])
    with open(os.path.join(eval_dir, "history.json")) as f:
        hist = json.load(f)
    assert len(hist["mAP"]) == 2


def test_validation_sub_code_and_self_retrieval(trained_run, workdir):
    logdir, _ = trained_run
    res = run_main([
        "exp=validation", f"logdir={logdir}", f"data_dir={workdir}",
        f"eval_logdir={os.path.join(workdir, 'eval2')}", "batch_size=8",
        "sub_code_eval=true", "sub_code_eval_setting.start_bit=0",
        "sub_code_eval_setting.end_bit=8", "test_as_database=true",
    ])
    assert "mAP" in res


def test_extract_mode(trained_run, workdir):
    logdir, _ = trained_run
    eval_dir = os.path.join(workdir, "eval3")
    run_main(["exp=extract", f"logdir={logdir}", f"data_dir={workdir}",
              f"eval_logdir={eval_dir}", "batch_size=8"])
    from concepthash_tpu.utils.io import load_checkpoint

    blob = load_checkpoint(os.path.join(eval_dir, "outputs.msgpack"))
    assert blob["test"]["codes"].shape == (12, 16)


def test_resume(trained_run, workdir):
    logdir, _ = trained_run
    logdir2 = os.path.join(workdir, "run1_resumed")
    run_main([
        "dataset=synthetic", "model=concepthash", "backbone=tiny_test",
        "optim=sgd", "model.nbit=16", "model.text_projection_dims=[32]",
        "batch_size=8", "epochs=3", "eval_interval=1",
        f"data_dir={workdir}", f"logdir={logdir2}", "seed=7",
        f"resume_logdir={logdir}", "scheduler.warmup_epochs=1",
    ])
    with open(os.path.join(logdir2, "train_history.json")) as f:
        hist = json.load(f)
    # resumed at epoch 2, trained 1 more (epochs=3)
    assert hist[-1]["ep"] == 2


def test_finetune_path_chains_runs(trained_run, workdir):
    """finetune_path initializes run 2's model from run 1's best checkpoint
    with a FRESH optimizer and history (reference train_helper.py:89-91)."""
    logdir, _ = trained_run
    logdir2 = os.path.join(workdir, "run1_finetuned")
    run_main([
        "dataset=synthetic", "model=concepthash", "backbone=tiny_test",
        "optim=sgd", "model.nbit=16", "model.text_projection_dims=[32]",
        "batch_size=8", "epochs=1", "eval_interval=1",
        f"data_dir={workdir}", f"logdir={logdir2}", "seed=11",
        f"finetune_path={logdir}", "scheduler.warmup_epochs=1",
    ])
    with open(os.path.join(logdir2, "train_history.json")) as f:
        hist = json.load(f)
    # fresh history: starts at epoch 0 (unlike resume)
    assert [h["ep"] for h in hist] == [0]
    # weights really came from run 1's best checkpoint
    import re

    with open(os.path.join(logdir2, "log.txt")) as f:
        log = f.read()
    m = re.search(r"finetune: loaded (\d+) tensors from (\S+) \((\d+) kept",
                  log)
    assert m, "finetune log line missing"
    assert int(m.group(1)) > 0 and int(m.group(3)) == 0
    assert m.group(2).endswith(os.path.join("models", "best.msgpack"))


def test_shallow_regime_cli(workdir):
    """Shallow (non-gradient) regime end-to-end through the CLI: fit on
    train-augmented features (_extract_fit_features), eval with the standard
    pipeline, artifacts written. Locks the augmented-fit semantics the pca
    parity row established (reference trainers/shallow.py:104-121 fits on
    the augmented train-loader output)."""
    logdir = os.path.join(workdir, "run_pca")
    best = run_main([
        "dataset=synthetic", "model=pca", "backbone=tiny_test",
        "model.nbit=8", "batch_size=8", "epochs=1",
        f"data_dir={workdir}", f"logdir={logdir}", "seed=7",
    ])
    assert best is not None and 0.0 <= best <= 1.0
    with open(os.path.join(logdir, "test_history.json")) as f:
        hist = json.load(f)
    assert len(hist) == 1 and "mAP" in hist[0]
    assert os.path.exists(os.path.join(logdir, "models", "best.msgpack"))
    # the fit state must be reusable: reload and re-encode deterministically
    from concepthash_tpu.losses.shallow import encode_shallow
    from concepthash_tpu.utils.io import load_checkpoint

    fit = load_checkpoint(os.path.join(logdir, "models", "best.msgpack"))
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((4, fit["criterion"]["comps"].shape[1]))
    c1 = encode_shallow(fit["criterion"], feats)
    c2 = encode_shallow(fit["criterion"], feats)
    assert np.allclose(c1, c2) and c1.shape == (4, 8)
