"""CNN trunk port parity: real torch forwards vs the flax trunks.

The flax ResNet/AlexNet/VGG16 (models/resnet.py, models/convnets.py) claim
torchvision-exact geometry so trained weights import element-for-element
(models/cnn_loader.py). These tests build the torchvision-compatible torch
shims (parity/shims/torchvision — identical state_dict layout and forward
geometry), convert their randomly-initialized (and, for BN, train-stepped)
weights, and assert the two frameworks produce the same features.

Reference surface: models/backbone/{resnet,alexnet,vgg16}.py wrap these
torchvision models; resnet is the only CNN family whose arch composition
works upstream (arch/base.py:47 reads backbone.model) — the others cover
users porting raw torchvision weights.
"""

import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SHIMS = os.path.join(REPO, "parity", "shims")


@pytest.fixture(scope="module")
def tvm():
    """The torchvision.models shim, imported without leaving parity/shims
    on sys.path (only the 'torchvision*' module names get cached)."""
    sys.path.insert(0, SHIMS)
    try:
        import torchvision.models as m
        return m
    finally:
        sys.path.remove(SHIMS)


def _torch_batch(seed, size):
    import torch

    g = torch.Generator().manual_seed(seed)
    return torch.randn(2, 3, size, size, generator=g)


def _bn_warmup(model, size, steps=3, seed=7):
    import torch

    model.train()
    with torch.no_grad():
        for i in range(steps):
            model(_torch_batch(seed + i, size))
    model.eval()


def _np_sd(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


@pytest.mark.parametrize("depth", [18, 50])
def test_resnet_port(tvm, depth):
    import torch

    from concepthash_tpu.models.cnn_loader import resnet_params_from_torch
    from concepthash_tpu.models.resnet import ResNet, ResNetConfig

    torch.manual_seed(0)
    m = getattr(tvm, f"resnet{depth}")()
    _bn_warmup(m, 64)
    x = _torch_batch(1, 64)
    with torch.no_grad():  # the reference wrapper's trunk forward
        y = m.maxpool(m.relu(m.bn1(m.conv1(x))))
        y = m.layer4(m.layer3(m.layer2(m.layer1(y))))
        feats_t = torch.flatten(m.avgpool(y), 1).numpy()

    params, stats = resnet_params_from_torch(_np_sd(m), depth)
    out = ResNet(ResNetConfig(depth)).apply(
        {"params": params, "batch_stats": stats},
        x.numpy().transpose(0, 2, 3, 1), train=False)
    np.testing.assert_allclose(np.asarray(out["features"]), feats_t,
                               atol=2e-4, rtol=1e-4)
    # the BN warmup must have produced nontrivial running stats, or this
    # proves nothing about the stats mapping
    assert abs(np.asarray(stats["stem_bn"]["mean"])).max() > 1e-3


def test_reference_arch_imports_under_shims():
    """The reference imports symbols from torchvision at module scope
    (models/arch/semicon.py:7 pulls conv1x1/conv3x3 out of
    torchvision.models.resnet); replacing the shim's catch-all __getattr__
    with real ResNet factories must keep those importable or every
    semicon/semicon_ce parity run dies at import (regression: round-4
    continuation)."""
    import subprocess
    import textwrap

    ref = os.environ.get("PARITY_REFERENCE_DIR", "/root/reference")
    if not os.path.isdir(ref):
        pytest.skip("reference tree unavailable")
    code = textwrap.dedent(f"""
        import sys
        sys.path.insert(0, {SHIMS!r}); sys.path.insert(1, {ref!r})
        sys.path.insert(2, {os.path.join(REPO, 'parity')!r})
        import compat; compat.apply()
        import models.arch.semicon_ce, models.arch.semicon
        from torchvision.models.resnet import conv1x1, conv3x3
        print("ok")
    """)
    res = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=300)
    assert res.returncode == 0, res.stderr[-2000:]
    assert "ok" in res.stdout


def test_resnet_frozen_bn_matches_reference_quirk():
    """The reference's ResNet18 wrapper pins BatchNorm to eval mode during
    training (backbone/resnet.py:76-82; depths 50/101 have no override), so
    train-mode forwards neither update the running stats nor normalize by
    batch statistics. ResNetConfig(frozen_bn=True) mirrors that: a
    train-mode apply returns batch_stats unchanged and the same output as
    the eval forward."""
    import jax
    import numpy as np

    from concepthash_tpu.models.resnet import ResNet, ResNetConfig

    x = np.random.default_rng(0).standard_normal((2, 32, 32, 3)).astype(
        np.float32)
    model = ResNet(ResNetConfig(18, frozen_bn=True))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out_train, mutated = model.apply(variables, x, train=True,
                                     mutable=["batch_stats"])
    out_eval = model.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(out_train["features"]),
                               np.asarray(out_eval["features"]))
    jax.tree_util.tree_map(
        np.testing.assert_allclose, mutated["batch_stats"],
        dict(variables["batch_stats"]))

    # and the unfrozen default does neither: stats move, outputs differ
    model2 = ResNet(ResNetConfig(18))
    v2 = model2.init(jax.random.PRNGKey(0), x, train=False)
    out2, mut2 = model2.apply(v2, x, train=True, mutable=["batch_stats"])
    stem = np.asarray(mut2["batch_stats"]["stem_bn"]["mean"])
    assert np.abs(stem).max() > 1e-4

    # config plumbing: the backbone-group yaml flag reaches ResNetConfig
    from concepthash_tpu.models.trunk import trunk_from_config

    t18 = trunk_from_config({"family": "resnet", "depth": 18,
                             "frozen_bn": True})
    assert t18.resnet_cfg.frozen_bn and t18.resnet_cfg.depth == 18
    t50 = trunk_from_config({"family": "resnet", "depth": 50})
    assert not t50.resnet_cfg.frozen_bn


def _classifier_features(m, x, n=6):
    import torch

    with torch.no_grad():
        y = torch.flatten(m.avgpool(m.features(x)), 1)
        for i in range(n):
            y = m.classifier[i](y)
    return y.numpy()


def test_alexnet_port(tvm):
    import torch

    from concepthash_tpu.models.cnn_loader import alexnet_params_from_torch
    from concepthash_tpu.models.convnets import AlexNet

    torch.manual_seed(0)
    m = tvm.alexnet().eval()
    x = _torch_batch(1, 64)
    feats_t = _classifier_features(m, x)

    params = alexnet_params_from_torch(_np_sd(m), fc_prefix="classifier")
    out = AlexNet().apply({"params": params},
                          x.numpy().transpose(0, 2, 3, 1), train=False)
    np.testing.assert_allclose(np.asarray(out["features"]), feats_t,
                               atol=2e-4, rtol=1e-4)


@pytest.mark.parametrize("family", ["alexnet", "vgg16"])
def test_wrapper_fc_layout_import(tvm, family):
    """The reference alexnet/vgg wrappers slice torchvision classifier[0:6]
    into ``fc`` (models/backbone/alexnet.py:15-19, vgg16.py:16-21), so
    trained checkpoints carry fc.{1,4} / fc.{0,3}. _tower_patch must
    autodetect that layout (vs raw torchvision classifier.*) and import the
    right Linears; also: keys the trunks intentionally drop (the final
    1000-way classifier, BN counters) must not surface as unused, while a
    genuinely unknown key MUST."""
    import torch

    from concepthash_tpu.models.convnets import VGG16, AlexNet
    from concepthash_tpu.utils.torch_import import ImportReport, _tower_patch

    torch.manual_seed(3)
    m = (tvm.alexnet() if family == "alexnet" else tvm.vgg16()).eval()
    x = _torch_batch(2, 64)
    feats_t = _classifier_features(m, x)

    fc_map = {"alexnet": (1, 4), "vgg16": (0, 3)}[family]
    sd = {}
    for k, v in _np_sd(m).items():
        if k.startswith("classifier."):
            idx = int(k.split(".")[1])
            if idx not in fc_map:
                continue  # wrapper slices [0:6]; 6 is the 1000-way head
            k = f"fc.{idx}" + k[len(f"classifier.{idx}"):]
        sd["backbone." + k] = v
    report = ImportReport(sd)
    params, stats = _tower_patch(sd, report)
    assert stats is None
    assert report.unused == [], report.unused[:8]

    model = AlexNet() if family == "alexnet" else VGG16()
    out = model.apply({"params": params},
                      x.numpy().transpose(0, 2, 3, 1), train=False)
    np.testing.assert_allclose(np.asarray(out["features"]), feats_t,
                               atol=2e-4, rtol=1e-4)

    # an unrecognized variant key must be REPORTED, not silently dropped
    sd2 = dict(sd)
    sd2["backbone.features.0.lora_A"] = np.zeros((2, 2), np.float32)
    r2 = ImportReport(sd2)
    _tower_patch(sd2, r2)
    assert r2.unused == ["backbone.features.0.lora_A"]


def test_vgg16_port(tvm):
    import torch

    from concepthash_tpu.models.cnn_loader import vgg16_params_from_torch
    from concepthash_tpu.models.convnets import VGG16

    torch.manual_seed(0)
    m = tvm.vgg16().eval()
    x = _torch_batch(1, 64)
    feats_t = _classifier_features(m, x)

    params = vgg16_params_from_torch(_np_sd(m), fc_prefix="classifier")
    out = VGG16().apply({"params": params},
                        x.numpy().transpose(0, 2, 3, 1), train=False)
    np.testing.assert_allclose(np.asarray(out["features"]), feats_t,
                               atol=2e-4, rtol=1e-4)
