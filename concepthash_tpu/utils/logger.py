"""Logging setup + experiment-history JSON writer.

Mirrors the reference's ``utils.logger.setup_logging`` contract
(reference experiments/train_helper.py:58) and the history-JSON persistence of
train_helper.py:141-153. wandb is intentionally not wired (the reference
hardcodes an API key at train_helper.py:133 — a hygiene bug we do not
replicate; SURVEY.md §5.5). A no-op hook is kept for API parity.
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


def wandb_log(_d: dict):
    """No-op hook kept for call-site parity (train_helper.py:19)."""


def wandb_commit():
    """No-op hook kept for call-site parity."""


class HistoryWriter:
    """Append-only experiment history persisted as JSON.

    The reference keeps ``train_history.json`` / ``test_history.json`` as the
    de-facto experiment database (train_helper.py:141-153); we keep the same
    file layout so downstream tooling works unchanged.
    """

    def __init__(self, logdir: str, name: str):
        self.path = os.path.join(logdir, f"{name}_history.json")
        self.history: list[dict] = []

    def load(self):
        if os.path.exists(self.path):
            with open(self.path) as f:
                self.history = json.load(f)
        return self.history

    def append(self, record: dict):
        self.history.append(_to_jsonable(record))
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
