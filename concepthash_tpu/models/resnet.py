"""Flax ResNet trunk (18/34/50/101) for the CNN backbone family
(reference models/backbone/resnet.py wraps torchvision ResNets; here a
from-scratch flax implementation with torchvision-exact geometry, so
trained torchvision/reference weights import element-for-element via
models/cnn_loader.py — offline environments run random-init).
Returns {'features': (B, D)} via global average pooling."""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax.numpy as jnp

_STAGES = {
    18: ("basic", (2, 2, 2, 2)),
    34: ("basic", (3, 4, 6, 3)),
    50: ("bottleneck", (3, 4, 6, 3)),
    101: ("bottleneck", (3, 4, 23, 3)),
}


@dataclasses.dataclass(frozen=True)
class ResNetConfig:
    depth: int = 50
    # The reference's ResNet18 wrapper (and ONLY ResNet18 — 50/101 have no
    # such override) forces every BatchNorm to eval mode during training
    # (models/backbone/resnet.py:76-82): stats never update and the forward
    # always normalizes with the loaded running stats. frozen_bn mirrors
    # that (configs/backbone/resnet18.yaml sets it true).
    frozen_bn: bool = False

    @property
    def features_size(self) -> int:
        block, _ = _STAGES[self.depth]
        return 512 * (4 if block == "bottleneck" else 1)


class _BasicBlock(nn.Module):
    filters: int
    strides: int
    dtype: Any

    @nn.compact
    def __call__(self, x, train: bool):
        bn = lambda name: nn.BatchNorm(use_running_average=not train,
                                       momentum=0.9, dtype=self.dtype, name=name)
        res = x
        y = nn.Conv(self.filters, (3, 3), (self.strides,) * 2, padding=1,
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = nn.relu(bn("bn1")(y))
        y = nn.Conv(self.filters, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = bn("bn2")(y)
        if res.shape != y.shape:
            res = nn.Conv(self.filters, (1, 1), (self.strides,) * 2,
                          padding=0, use_bias=False, dtype=self.dtype,
                          name="down_conv")(res)
            res = bn("down_bn")(res)
        return nn.relu(res + y)


class _Bottleneck(nn.Module):
    filters: int
    strides: int
    dtype: Any

    @nn.compact
    def __call__(self, x, train: bool):
        bn = lambda name: nn.BatchNorm(use_running_average=not train,
                                       momentum=0.9, dtype=self.dtype, name=name)
        res = x
        y = nn.Conv(self.filters, (1, 1), padding=0, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        y = nn.relu(bn("bn1")(y))
        y = nn.Conv(self.filters, (3, 3), (self.strides,) * 2, padding=1,
                    use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = nn.relu(bn("bn2")(y))
        y = nn.Conv(self.filters * 4, (1, 1), padding=0, use_bias=False,
                    dtype=self.dtype, name="conv3")(y)
        y = bn("bn3")(y)
        if res.shape != y.shape:
            res = nn.Conv(self.filters * 4, (1, 1), (self.strides,) * 2,
                          padding=0, use_bias=False, dtype=self.dtype,
                          name="down_conv")(res)
            res = bn("down_bn")(res)
        return nn.relu(res + y)


class ResNet(nn.Module):
    cfg: ResNetConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images, train: bool = False,
                 with_feature_map: bool = False, **_):
        block_kind, stages = _STAGES[self.cfg.depth]
        Block = _BasicBlock if block_kind == "basic" else _Bottleneck
        if self.cfg.frozen_bn:
            train = False  # eval-mode BN even in training (reference quirk)
        x = images.astype(self.dtype)
        # explicit torchvision padding throughout (stem p=3, maxpool p=1,
        # 3x3 convs p=1): flax 'SAME' centers stride-2 windows differently
        # on even inputs, which would break element-exact weight import
        # (utils/torch_import.py).
        x = nn.Conv(64, (7, 7), (2, 2), padding=3, use_bias=False,
                    dtype=self.dtype, name="stem_conv")(x)
        x = nn.relu(nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 dtype=self.dtype, name="stem_bn")(x))
        x = nn.max_pool(x, (3, 3), (2, 2), padding=((1, 1), (1, 1)))
        for i, n_blocks in enumerate(stages):
            for j in range(n_blocks):
                strides = 2 if (i > 0 and j == 0) else 1
                x = Block(64 * (2 ** i), strides, self.dtype,
                          name=f"stage{i}_block{j}")(x, train)
        feats = x.mean(axis=(1, 2)).astype(jnp.float32)
        out = {"features": feats}
        if with_feature_map:
            B, H, W, C = x.shape
            out["tokens"] = x.reshape(B, H * W, C)  # spatial grid as tokens
        return out
