"""Logging setup + experiment-history JSON writer + optional event tracker.

Mirrors the reference's ``utils.logger.setup_logging`` contract
(reference experiments/train_helper.py:58) and the history-JSON persistence of
train_helper.py:141-153. The reference's wandb integration
(train_helper.py:125-139) is replaced by ``Tracker``: the same config gate
(``wandb:`` key, default off) but emitting local JSONL events instead of a
network service. DEVIATION, documented: the reference hardcodes a wandb API
key at train_helper.py:133 — a hygiene bug we do not replicate; no
credential, no network, and the event stream (<logdir>/events.jsonl, one
JSON object per line) is trivially importable into wandb/tensorboard
offline.
"""

from __future__ import annotations

import json
import logging
import os
import sys


def setup_logging(logfile: str | None = None, level=logging.INFO):
    root = logging.getLogger()
    root.setLevel(level)
    # Avoid duplicate handlers if called twice (e.g. in tests).
    for h in list(root.handlers):
        root.removeHandler(h)
    fmt = logging.Formatter("%(asctime)s %(levelname)s %(message)s")
    sh = logging.StreamHandler(sys.stdout)
    sh.setFormatter(fmt)
    root.addHandler(sh)
    if logfile:
        os.makedirs(os.path.dirname(logfile), exist_ok=True)
        fh = logging.FileHandler(logfile)
        fh.setFormatter(fmt)
        root.addHandler(fh)


class Tracker:
    """Config-gated experiment-event emitter (reference ``wandb:`` surface,
    train_helper.py:125-139, configs/train.yaml:28 default False).

    ``cfg`` is the config's ``wandb`` value: falsy -> disabled (every call a
    no-op); truthy -> append events to ``<logdir>/events.jsonl``. ``log``
    accumulates fields into the pending event (wandb.log(commit=False)
    semantics); ``commit`` writes it as one JSON line.
    """

    def __init__(self, cfg, logdir: str):
        self.enabled = bool(cfg)
        self.path = os.path.join(logdir, "events.jsonl")
        self._pending: dict = {}
        # ALWAYS take over the module hook slot: a disabled run must
        # deregister any earlier run's tracker, or the hooks would keep
        # appending the new run's events to the finished run's file
        # (multi-run processes: scripts/runbook_pretrained.py)
        global _active_tracker
        _active_tracker = self if self.enabled else None
        if self.enabled:
            logging.info("tracker enabled -> %s", self.path)

    def log(self, d: dict):
        if self.enabled:
            self._pending.update(_to_jsonable(d))

    def commit(self):
        if self.enabled and self._pending:
            os.makedirs(os.path.dirname(self.path), exist_ok=True)
            with open(self.path, "a") as f:
                f.write(json.dumps(self._pending) + "\n")
            self._pending = {}


_active_tracker: Tracker | None = None


def wandb_log(d: dict):
    """Module-level hook kept for call-site parity (train_helper.py:19);
    delegates to the active Tracker when one is enabled."""
    if _active_tracker is not None:
        _active_tracker.log(d)


def wandb_commit():
    """Module-level hook kept for call-site parity."""
    if _active_tracker is not None:
        _active_tracker.commit()


class HistoryWriter:
    """Append-only experiment history persisted as JSON.

    The reference keeps ``train_history.json`` / ``test_history.json`` as the
    de-facto experiment database (train_helper.py:141-153); we keep the same
    file layout so downstream tooling works unchanged.
    """

    def __init__(self, logdir: str, name: str, tracker: Tracker | None = None):
        self.path = os.path.join(logdir, f"{name}_history.json")
        self.name = name
        self.tracker = tracker
        self.history: list[dict] = []

    def load(self):
        if os.path.exists(self.path):
            with open(self.path) as f:
                self.history = json.load(f)
        return self.history

    def append(self, record: dict):
        rec = _to_jsonable(record)
        self.history.append(rec)
        if self.tracker is not None:
            # wandb-style namespacing: train/loss, test/mAP, ...
            self.tracker.log({f"{self.name}/{k}": v for k, v in rec.items()})
            self.tracker.commit()
        self.save()

    def save(self):
        os.makedirs(os.path.dirname(self.path), exist_ok=True)
        with open(self.path, "w") as f:
            json.dump(self.history, f, indent=2)


def _to_jsonable(x):
    import numpy as np

    if isinstance(x, dict):
        return {k: _to_jsonable(v) for k, v in x.items()}
    if isinstance(x, (list, tuple)):
        return [_to_jsonable(v) for v in x]
    if isinstance(x, (np.floating, np.integer)):
        return x.item()
    if hasattr(x, "item") and getattr(x, "ndim", None) == 0:
        return x.item()
    if isinstance(x, (np.ndarray,)):
        return x.tolist()
    return x
