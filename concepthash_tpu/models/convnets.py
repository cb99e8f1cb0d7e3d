"""Flax AlexNet / VGG16 trunks (reference models/backbone/alexnet.py:8-33,
vgg16.py:8-30 wrap the torchvision models and expose the 4096-d penultimate
fc activation as ``features``). Geometry matches torchvision exactly so a
future weight port is mechanical; offline environments run random-init like
the other CNN trunks (models/resnet.py).

TPU notes: convs are NHWC (XLA's preferred layout); the flatten before the
first fc transposes to channel-major first so torch fc weights would map 1:1.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

# VGG16 feature stacks: torchvision cfg "D" (conv counts per 2x-pooled stage).
_VGG16_STAGES: Sequence[Sequence[int]] = ((64, 64), (128, 128),
                                          (256, 256, 256),
                                          (512, 512, 512), (512, 512, 512))


def _adaptive_avg_pool(x, out_hw: int):
    """torch AdaptiveAvgPool2d semantics on a static-shape NHWC tensor:
    bin i spans [floor(i*H/out), ceil((i+1)*H/out)). The loop over output
    bins unrolls at trace time (out_hw <= 7)."""
    B, H, W, C = x.shape
    if H == out_hw and W == out_hw:
        return x
    if H % out_hw == 0 and W % out_hw == 0:
        return x.reshape(B, out_hw, H // out_hw, out_hw, W // out_hw,
                         C).mean(axis=(2, 4))
    rows = []
    for i in range(out_hw):
        h0, h1 = (i * H) // out_hw, -((-(i + 1) * H) // out_hw)
        cols = []
        for j in range(out_hw):
            w0, w1 = (j * W) // out_hw, -((-(j + 1) * W) // out_hw)
            cols.append(x[:, h0:h1, w0:w1].mean(axis=(1, 2)))
        rows.append(jnp.stack(cols, axis=1))
    return jnp.stack(rows, axis=1)  # (B, out, out, C)


def _flatten_chw(x):
    """Flatten NHWC spatial map in torch's (C, H, W) order so fc weights from
    a torchvision port line up element-for-element."""
    B = x.shape[0]
    return jnp.transpose(x, (0, 3, 1, 2)).reshape(B, -1)


class AlexNet(nn.Module):
    """torchvision AlexNet geometry; returns {'features': (B, 4096)}."""

    dtype: Any = jnp.float32
    features_size: int = 4096

    @nn.compact
    def __call__(self, images, train: bool = False, **_):
        x = images.astype(self.dtype)
        # torchvision padding: 2 for k11s4 and k5, 1 for the k3 convs
        x = nn.Conv(64, (11, 11), (4, 4), padding=2, dtype=self.dtype,
                    name="conv0")(x)
        x = nn.max_pool(nn.relu(x), (3, 3), (2, 2))
        x = nn.Conv(192, (5, 5), padding=2, dtype=self.dtype, name="conv1")(x)
        x = nn.max_pool(nn.relu(x), (3, 3), (2, 2))
        x = nn.relu(nn.Conv(384, (3, 3), padding=1, dtype=self.dtype,
                            name="conv2")(x))
        x = nn.relu(nn.Conv(256, (3, 3), padding=1, dtype=self.dtype,
                            name="conv3")(x))
        x = nn.relu(nn.Conv(256, (3, 3), padding=1, dtype=self.dtype,
                            name="conv4")(x))
        x = nn.max_pool(x, (3, 3), (2, 2))
        x = _adaptive_avg_pool(x, 6)
        x = _flatten_chw(x)  # (B, 256*6*6)
        # classifier[0:6]: Dropout, fc6, ReLU, Dropout, fc7, ReLU (the final
        # fc is the reference's `classify` head, not part of `features`)
        x = nn.Dropout(0.5, deterministic=not train)(x)
        x = nn.relu(nn.Dense(4096, dtype=self.dtype, name="fc6")(x))
        x = nn.Dropout(0.5, deterministic=not train)(x)
        x = nn.relu(nn.Dense(4096, dtype=self.dtype, name="fc7")(x))
        return {"features": x.astype(jnp.float32)}


class VGG16(nn.Module):
    """torchvision VGG16 geometry; returns {'features': (B, 4096)} plus the
    last conv grid as 'tokens' (for fine-grained heads)."""

    dtype: Any = jnp.float32
    features_size: int = 4096

    @nn.compact
    def __call__(self, images, train: bool = False, **_):
        x = images.astype(self.dtype)
        for si, stage in enumerate(_VGG16_STAGES):
            for ci, f in enumerate(stage):
                x = nn.relu(nn.Conv(f, (3, 3), padding=1, dtype=self.dtype,
                                    name=f"conv{si}_{ci}")(x))
            x = nn.max_pool(x, (2, 2), (2, 2))
        B, H, W, C = x.shape
        tokens = x.reshape(B, H * W, C)
        x = _adaptive_avg_pool(x, 7)
        x = _flatten_chw(x)  # (B, 512*7*7)
        x = nn.relu(nn.Dense(4096, dtype=self.dtype, name="fc6")(x))
        x = nn.Dropout(0.5, deterministic=not train)(x)
        x = nn.relu(nn.Dense(4096, dtype=self.dtype, name="fc7")(x))
        x = nn.Dropout(0.5, deterministic=not train)(x)
        return {"features": x.astype(jnp.float32), "tokens": tokens}
