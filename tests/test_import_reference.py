"""Reference-checkpoint import: torch ``models/*.pth`` -> flax variables.

Verifies concepthash_tpu.utils.torch_import reproduces the reference forward
bit-for-bit (float32 CPU, tolerance ~1e-5) on the three head families that
span the mapping surface:

- dpsh: flat Linear head over an adapter-tuned CLIP tower, using a REAL
  trained checkpoint committed by the parity harness
  (parity/runs/ms/ref_dpsh_s42/models/best.pth).
- orthohash: Sequential(Linear, BatchNorm) head + CosSim classifier +
  codebook buffer (exercises the batch_stats mapping).
- concepthash (flagship): hash queries + torch nn.MultiheadAttention block +
  shared hash_fc + BN + concept CosSim + text_projection MLP + center buffer.

The torch side runs in a subprocess (parity/dump_reference_forward.py) so the
reference's sys.path shims never leak into this process.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ASSETS = os.path.join(REPO, "parity", "assets")
REFERENCE = os.environ.get("PARITY_REFERENCE_DIR", "/root/reference")
DPSH_PTH = os.path.join(REPO, "parity", "runs", "ms", "ref_dpsh_s42",
                        "models", "best.pth")

pytestmark = pytest.mark.skipif(
    not (os.path.isdir(REFERENCE) and os.path.isdir(ASSETS)),
    reason="reference tree or parity assets unavailable")


def _dump(tmp_path, method, pth=None, save_sd=False, train_steps=0,
          backbone=None):
    out = str(tmp_path / f"{method}.npz")
    cmd = [sys.executable,
           os.path.join(REPO, "parity", "dump_reference_forward.py"),
           "--method", method, "--out", out]
    if pth:
        cmd += ["--pth", pth]
    if train_steps:
        cmd += ["--train-steps", str(train_steps)]
    if backbone:
        cmd += ["--backbone", backbone]
    sd_path = None
    if save_sd:
        sd_path = str(tmp_path / f"{method}_sd.pth")
        cmd += ["--save-sd", sd_path]
    subprocess.run(cmd, check=True, timeout=600,
                   stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    return np.load(out), sd_path


def _overrides(model_group, logdir):
    return [
        "dataset=synthetic", f"model={model_group}", "backbone=tiny_test",
        "optim=sgd", "transforms=test",
        f"backbone.name={ASSETS}/tiny-clip", "backbone.pretrained=true",
        "model.nbit=16", "dataset.nclass=6",
        "model.adapter_bottleneck_dim=8",
        f"data_dir={ASSETS}", f"logdir={logdir}",
    ]


def _build(overrides, logdir):
    import jax

    from concepthash_tpu.config import load_config
    from concepthash_tpu.methods import get_method, prepare_codebook

    cfg = load_config(os.path.join(REPO, "configs"), "train", overrides)
    method = get_method(cfg["model"]["name"])
    codebook = (prepare_codebook(method, cfg, logdir)
                if method.codebook else None)
    model = method.build_model(cfg, codebook)
    rng = jax.random.PRNGKey(0)
    dummy = np.zeros((2, 48, 48, 3), np.float32)
    variables = model.init({"params": rng, "dropout": rng}, dummy,
                           train=False)
    return cfg, model, {k: variables[k] for k in variables}


def _import_and_apply(npz, sd_path, method_name, cfg, model, template):
    from concepthash_tpu.utils.torch_import import (
        import_reference_state_dict, load_state_dict)

    sd = load_state_dict(sd_path)
    newvars, report = import_reference_state_dict(sd, method_name, cfg,
                                                  template)
    assert report.unused == [], f"unmapped keys: {report.unused[:10]}"
    x = npz["x"].transpose(0, 2, 3, 1)
    return model.apply(newvars, x, train=False), newvars


def test_dpsh_trained_checkpoint(tmp_path):
    """Real trained reference artifact -> identical codes."""
    if not os.path.exists(DPSH_PTH):
        pytest.skip("committed dpsh parity artifact missing")
    npz, _ = _dump(tmp_path, "dpsh", pth=DPSH_PTH)
    cfg, model, tpl = _build(_overrides("dpsh_adapter", str(tmp_path)),
                             str(tmp_path))
    out, _ = _import_and_apply(npz, DPSH_PTH, "dpsh", cfg, model, tpl)
    codes = np.asarray(out["codes"])
    np.testing.assert_allclose(codes, npz["codes"], atol=2e-5)
    assert (np.sign(codes) == np.sign(npz["codes"])).all()


def test_imported_run_evaluates_through_cli(tmp_path):
    """scripts/import_reference_checkpoint.py emits a full run dir that
    exp=validation consumes: the reference-trained dpsh model scores its
    trained-quality mAP through our CLI without retraining."""
    if not os.path.exists(DPSH_PTH):
        pytest.skip("committed dpsh parity artifact missing")
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "import_reference_checkpoint",
        os.path.join(REPO, "scripts", "import_reference_checkpoint.py"))
    tool = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(tool)
    outdir = str(tmp_path / "imported")
    tool.main(["--pth", DPSH_PTH, "--outdir", outdir] +
              _overrides("dpsh_adapter", outdir))
    assert os.path.exists(os.path.join(outdir, "models", "best.msgpack"))
    assert os.path.exists(os.path.join(outdir, "config.yaml"))

    sys.path.insert(0, REPO)
    try:
        import main as cli

        res = cli.main(["exp=validation", f"logdir={outdir}",
                        f"data_dir={ASSETS}"])
    finally:
        sys.path.remove(REPO)
    # the reference run's trained quality (tiny proto dpsh ~0.98); an
    # unmapped/garbled import would score near chance (~1/6)
    assert res["mAP"] > 0.9


def test_orthohash_import(tmp_path):
    """Linear+BN head, CosSim classifier, codebook buffer (batch_stats).

    train_steps=3 populates the BN running stats before the dump so this
    proves the batch_stats mapping on nontrivial values (fresh-init stats
    are mean=0/var=1, which a garbled mapping would also produce).
    """
    npz, sd_path = _dump(tmp_path, "orthohash", save_sd=True, train_steps=3)
    ov = _overrides("orthohash_adapter", str(tmp_path)) + [
        "model.codebook.codebook_method=file",
        f"model.codebook.path={ASSETS}/codebook_N.npy",
    ]
    cfg, model, tpl = _build(ov, str(tmp_path))
    out, _ = _import_and_apply(npz, sd_path, "orthohash", cfg, model, tpl)
    np.testing.assert_allclose(np.asarray(out["codes"]), npz["codes"],
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(out["logits"]), npz["logits"],
                               atol=2e-5)


def test_adsh_import(tmp_path):
    """adsh head: Sequential(Linear(bias), Tanh) — no BatchNorm at index 1
    (reference models/arch/adsh.py:14-17), so the flat-head zoo must take
    the plain-Linear branch and map the bias (model.hash_bias=true). The
    rebuild applies tanh in the loss, not the model, so the model outputs
    compare through tanh (sign-identical either way)."""
    npz, sd_path = _dump(tmp_path, "adsh", save_sd=True)
    ov = _overrides("adsh", str(tmp_path)) + ["model.hash_bias=true"]
    cfg, model, tpl = _build(ov, str(tmp_path))
    out, _ = _import_and_apply(npz, sd_path, "adsh", cfg, model, tpl)
    codes = np.asarray(out["codes"])
    np.testing.assert_allclose(np.tanh(codes), npz["codes"], atol=2e-5)
    assert (np.sign(codes) == np.sign(npz["codes"])).all()


@pytest.mark.parametrize("depth", [18, 50])
def test_resnet_import(tmp_path, depth):
    """CNN tower path: the reference's dpsh over torchvision ResNet
    (backbone/resnet.py keeps the torchvision module at backbone.model —
    the only non-CLIP family whose upstream arch composition works,
    arch/base.py:47).

    train_steps=3 runs train-mode reference forwards before the dump. For
    resnet50 that makes the BatchNorm running stats nontrivial, proving the
    tower batch_stats graft. For resnet18 the reference wrapper pins BN to
    eval during training (backbone/resnet.py:76-82 — ONLY this depth), so
    the dumped stats must STAY at init; the rebuild mirrors that via
    frozen_bn (configs/backbone/resnet18.yaml)."""
    npz, sd_path = _dump(tmp_path, "dpsh", save_sd=True, train_steps=3,
                         backbone=f"resnet{depth}")
    ov = [
        "dataset=synthetic", "model=dpsh_adapter", f"backbone=resnet{depth}",
        "optim=sgd", "transforms=test", "model.nbit=16",
        "model.has_adapter=false", "dataset.nclass=6",
        f"data_dir={ASSETS}", f"logdir={tmp_path}",
    ]
    cfg, model, tpl = _build(ov, str(tmp_path))
    out, newvars = _import_and_apply(npz, sd_path, "dpsh", cfg, model, tpl)
    np.testing.assert_allclose(np.asarray(out["codes"]), npz["codes"],
                               atol=2e-5)
    stem = np.abs(np.asarray(
        newvars["batch_stats"]["backbone"]["tower"]["stem_bn"]["mean"]))
    if depth == 50:
        # nontrivial imported running stats (a garbled mapping that left
        # the template's zeros in place would pass a fresh-init comparison)
        assert stem.max() > 1e-3
    else:
        assert stem.max() == 0.0  # the reference froze BN at this depth


def test_vit_adapter_import(tmp_path):
    """ViT-family adapter import: the reference mounts adapters on HF-ViT
    backbones via vit_add_adapter_ (adapter.py:453-466) with the same key
    format and branch placement as the CLIP family (adapt_mlp_1 on the
    attention output pre-residual, adapt_mlp_2 on the post-dense MLP output
    — adapter.py:381-391, 329-338). The importer grafts them onto the vit
    trunk's adapter_attn/adapter_mlp slots; forward parity proves both the
    tower mapping and the adapter placement."""
    if not os.path.isdir(os.path.join(ASSETS, "tiny-vit")):
        # assets/ is untracked (parity/.gitignore) — regenerate just the
        # tiny ViT checkpoint (seeded, ~0.09M params, a few seconds)
        sys.path.insert(0, os.path.join(REPO, "parity"))
        try:
            from make_assets import make_tiny_vit

            make_tiny_vit(os.path.join(ASSETS, "tiny-vit"))
        finally:
            sys.path.remove(os.path.join(REPO, "parity"))
    npz, sd_path = _dump(tmp_path, "dpsh", save_sd=True, backbone="hfvit")
    ov = [
        "dataset=synthetic", "model=dpsh_adapter", "backbone=vit_s16",
        "optim=sgd", "transforms=test",
        f"backbone.name={ASSETS}/tiny-vit", "backbone.pretrained=false",
        "backbone.hidden_size=64", "backbone.intermediate_size=128",
        "backbone.num_layers=2", "backbone.num_heads=4",
        "backbone.patch_size=8", "backbone.image_size=48",
        "backbone.projection_dim=32", "backbone.layer_norm_eps=1e-12",
        "model.nbit=16", "dataset.nclass=6",
        "model.adapter_bottleneck_dim=8",
        f"data_dir={ASSETS}", f"logdir={tmp_path}",
    ]
    cfg, model, tpl = _build(ov, str(tmp_path))
    # the template must actually carry the adapter slots being tested
    l0 = tpl["params"]["backbone"]["tower"]["layers_0"]
    assert "adapter_attn" in l0 and "adapter_mlp" in l0
    out, newvars = _import_and_apply(npz, sd_path, "dpsh", cfg, model, tpl)
    codes = np.asarray(out["codes"])
    np.testing.assert_allclose(codes, npz["codes"], atol=2e-5)
    assert (np.sign(codes) == np.sign(npz["codes"])).all()
    # a garbled adapter graft leaves random init in the slots: prove the
    # imported values moved
    g = np.asarray(
        newvars["params"]["backbone"]["tower"]["layers_0"]["adapter_attn"]
        ["down"]["kernel"])
    t = np.asarray(l0["adapter_attn"]["down"]["kernel"])
    assert not np.allclose(g, t)


def test_concepthash_import_and_blob(tmp_path):
    """Flagship head mapping + the msgpack blob the CLI tool writes."""
    npz, sd_path = _dump(tmp_path, "concepthash", save_sd=True,
                         train_steps=2)
    ov = _overrides("concepthash", str(tmp_path)) + [
        "model.text_projection_dims=[32]",
        "model.fixed_center.codebook_method=file",
        f"model.fixed_center.path={ASSETS}/center.npy",
        "model.fixed_center.quantized=false",
    ]
    cfg, model, tpl = _build(ov, str(tmp_path))
    out, newvars = _import_and_apply(npz, sd_path, "concepthash", cfg, model,
                                     tpl)
    for key in ("codes", "logits_cont", "logits_bin", "logits_concept"):
        np.testing.assert_allclose(np.asarray(out[key]), npz[key], atol=2e-5,
                                   err_msg=key)

    # the CLI tool's blob round-trips through msgpack with the same values
    from flax import serialization

    from concepthash_tpu.utils import io as chio

    blob = {"params": newvars["params"],
            "batch_stats": newvars.get("batch_stats", {}),
            "constants": newvars.get("constants", {}), "epoch": 0}
    path = str(tmp_path / "best.msgpack")
    chio.fast_save(blob, path)
    chio.join_save_queue()
    with open(path, "rb") as f:
        loaded = serialization.msgpack_restore(f.read())
    hq = loaded["params"]["hash_queries"]
    np.testing.assert_allclose(hq, np.asarray(newvars["params"]["hash_queries"]))
