"""Torch -> flax weight converters for the CNN trunk family.

Maps torch state_dicts (torchvision layout, which is also the layout inside
reference checkpoints — models/backbone/resnet.py keeps the torchvision
module under ``self.model``; alexnet.py/vgg16.py re-attach ``features`` and
the penultimate classifier slice as ``fc``) onto the flax trunks in
models/resnet.py and models/convnets.py, whose geometry is
torchvision-exact. Conv kernels transpose (O,I,kh,kw) -> (kh,kw,I,O); fc
weights transpose; BatchNorm splits into params {scale,bias} and
batch_stats {mean,var}. Everything is numpy in/out.

Used by utils/torch_import.py (reference-checkpoint migration) and by the
port-parity tests (tests/test_cnn_port.py) against real torch forwards.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

_RESNET_STAGES = {
    18: ("basic", (2, 2, 2, 2)),
    34: ("basic", (3, 4, 6, 3)),
    50: ("bottleneck", (3, 4, 6, 3)),
    101: ("bottleneck", (3, 4, 23, 3)),
}


def _conv(sd, key):
    return {"kernel": np.asarray(sd[f"{key}.weight"]).transpose(2, 3, 1, 0)}


def _bn(sd, key):
    p = {"scale": np.asarray(sd[f"{key}.weight"]),
         "bias": np.asarray(sd[f"{key}.bias"])}
    s = {"mean": np.asarray(sd[f"{key}.running_mean"]),
         "var": np.asarray(sd[f"{key}.running_var"])}
    return p, s


def _fc(sd, key):
    return {"kernel": np.asarray(sd[f"{key}.weight"]).T,
            "bias": np.asarray(sd[f"{key}.bias"])}


def resnet_depth_from_torch(sd: Dict[str, np.ndarray]) -> int:
    """Infer 18/34/50/101 from the state_dict's block shape/counts."""
    kind = "bottleneck" if "layer1.0.conv3.weight" in sd else "basic"
    counts = []
    for li in range(1, 5):
        n = 0
        while f"layer{li}.{n}.conv1.weight" in sd:
            n += 1
        counts.append(n)
    for depth, (k, stages) in _RESNET_STAGES.items():
        if k == kind and tuple(counts) == stages:
            return depth
    raise ValueError(f"unrecognized ResNet layout: {kind} blocks {counts}")


def resnet_params_from_torch(sd: Dict[str, np.ndarray],
                             depth: int) -> Tuple[dict, dict]:
    """-> (params, batch_stats) for models/resnet.py ResNet."""
    kind, stages = _RESNET_STAGES[depth]
    convs = ("conv1", "conv2") if kind == "basic" else ("conv1", "conv2",
                                                        "conv3")
    params, stats = {}, {}
    params["stem_conv"] = _conv(sd, "conv1")
    params["stem_bn"], stats["stem_bn"] = _bn(sd, "bn1")
    for si, n_blocks in enumerate(stages):
        for bi in range(n_blocks):
            t = f"layer{si + 1}.{bi}"
            f = f"stage{si}_block{bi}"
            bp, bs = {}, {}
            for ci, cname in enumerate(convs, start=1):
                bp[cname] = _conv(sd, f"{t}.conv{ci}")
                bp[f"bn{ci}"], bs[f"bn{ci}"] = _bn(sd, f"{t}.bn{ci}")
            if f"{t}.downsample.0.weight" in sd:
                bp["down_conv"] = _conv(sd, f"{t}.downsample.0")
                bp["down_bn"], bs["down_bn"] = _bn(sd, f"{t}.downsample.1")
            params[f] = bp
            stats[f] = bs
    return params, stats


# torchvision Sequential indices of the conv layers
_ALEXNET_CONVS = (0, 3, 6, 8, 10)
_VGG16_CONVS = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)
_VGG16_STAGE_SIZES = (2, 2, 3, 3, 3)


def alexnet_params_from_torch(sd: Dict[str, np.ndarray],
                              fc_prefix: str = "fc",
                              fc_idx: Tuple[int, int] = (1, 4)) -> dict:
    """-> params for models/convnets.py AlexNet. ``fc_prefix``/``fc_idx``
    name the two penultimate Linears: the reference wrapper re-attaches
    torchvision classifier[0:6] as ``fc`` (alexnet.py:15-19) so trained
    checkpoints carry ``fc.1``/``fc.4``; a raw torchvision state_dict uses
    ``classifier``/(1, 4)."""
    params = {f"conv{i}": _conv(sd, f"features.{t}")
              for i, t in enumerate(_ALEXNET_CONVS)}
    for i, t in enumerate(_ALEXNET_CONVS):
        params[f"conv{i}"]["bias"] = np.asarray(sd[f"features.{t}.bias"])
    params["fc6"] = _fc(sd, f"{fc_prefix}.{fc_idx[0]}")
    params["fc7"] = _fc(sd, f"{fc_prefix}.{fc_idx[1]}")
    return params


def vgg16_params_from_torch(sd: Dict[str, np.ndarray],
                            fc_prefix: str = "fc",
                            fc_idx: Tuple[int, int] = (0, 3)) -> dict:
    """-> params for models/convnets.py VGG16 (reference wrapper keeps
    classifier[0:6] as ``fc``, vgg16.py:16-21; raw torchvision uses
    ``classifier``/(0, 3))."""
    params = {}
    k = 0
    for si, n in enumerate(_VGG16_STAGE_SIZES):
        for ci in range(n):
            t = _VGG16_CONVS[k]
            k += 1
            params[f"conv{si}_{ci}"] = _conv(sd, f"features.{t}")
            params[f"conv{si}_{ci}"]["bias"] = np.asarray(
                sd[f"features.{t}.bias"])
    params["fc6"] = _fc(sd, f"{fc_prefix}.{fc_idx[0]}")
    params["fc7"] = _fc(sd, f"{fc_prefix}.{fc_idx[1]}")
    return params
