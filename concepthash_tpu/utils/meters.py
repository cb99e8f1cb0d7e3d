"""Streaming scalar meters for per-epoch metric aggregation.

Equivalent role to the reference's ``utils.misc.AverageMeter`` (call sites:
reference trainers/base.py:265-268, 335-338), but designed for JAX: metric
dicts of device scalars are accumulated *on device* and fetched once per epoch
(the reference syncs host<->device every step via ``.item()`` — an
inefficiency we deliberately do not replicate, SURVEY.md §5.5).
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np


class AverageMeter:
    """Tracks a running average of a scalar. API-compatible with the
    reference's reconstructed ``utils.misc.AverageMeter`` (SURVEY.md §2.9)."""

    def __init__(self, name: str = ""):
        self.name = name
        self.reset()

    def reset(self):
        self.val = 0.0
        self.sum = 0.0
        self.count = 0
        self.avg = 0.0

    def update(self, val, n: int = 1):
        val = float(val)
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)

    def __repr__(self):
        return f"{self.name}: {self.avg:.6f} ({self.count})"


class MeterBank:
    """A defaultdict of AverageMeters plus a device-friendly bulk update.

    ``update_device(metrics, n)`` takes a dict of (possibly jax) scalars and
    buffers them; ``materialize()`` converts everything to host floats in one
    sweep (one device sync), returning ``{key: avg}``.
    """

    def __init__(self):
        self.meters = defaultdict(AverageMeter)
        self._pending = []  # list of (metrics_dict, n)

    def update(self, key: str, val, n: int = 1):
        self.meters[key].update(val, n)

    def update_device(self, metrics: dict, n=1):
        """``n`` is an int for scalar metrics, or a sequence of per-step
        counts when the metric values are stacked (K,) arrays (the scan-
        chunked train step returns one value per inner step)."""
        self._pending.append((metrics, n))

    def materialize(self) -> dict:
        # One host sync for the whole epoch's buffered metrics.
        for metrics, n in self._pending:
            for k, v in metrics.items():
                a = np.asarray(v)
                if a.ndim == 0:
                    self.meters[k].update(a.item(), n)
                else:  # stacked per-step values from a scan-chunked step
                    ns = n if np.ndim(n) else [n] * a.shape[0]
                    for val, ni in zip(a.reshape(a.shape[0], -1).mean(axis=1),
                                       ns):
                        self.meters[k].update(val, int(ni))
        self._pending.clear()
        return {k: m.avg for k, m in self.meters.items()}

    def averages(self) -> dict:
        self.materialize()
        return {k: m.avg for k, m in self.meters.items()}

    def __getitem__(self, key):
        return self.meters[key]

    def __contains__(self, key):
        return key in self.meters

    def keys(self):
        return self.meters.keys()
