"""Checkpoint IO: async save queue + msgpack pytree serialization.

Re-creates the reference's missing ``utils.io`` API surface
(``init_save_queue`` / ``fast_save`` / ``join_save_queue``; call sites
reference experiments/train_helper.py:49,299 and trainers/base.py:184-193)
on top of ``flax.serialization`` instead of ``torch.save``: checkpoints are
a single msgpack blob of the train-state pytree (SURVEY.md §5.4), written on
a background thread so the training loop never blocks on disk.
"""

from __future__ import annotations

import logging
import os
import queue
import threading

import jax
import numpy as np
from flax import serialization

_save_queue: "queue.Queue | None" = None
_save_thread: "threading.Thread | None" = None


def _worker():
    while True:
        item = _save_queue.get()
        if item is None:
            _save_queue.task_done()
            break
        obj, path = item
        try:
            _write_bytes(obj, path)
        except Exception:  # pragma: no cover - diagnostics only
            logging.exception("async save of %s failed", path)
        finally:
            _save_queue.task_done()


def init_save_queue():
    """Spawn the background checkpoint-writer thread (idempotent)."""
    global _save_queue, _save_thread
    if _save_thread is not None and _save_thread.is_alive():
        return
    _save_queue = queue.Queue()
    _save_thread = threading.Thread(target=_worker, daemon=True, name="ckpt-writer")
    _save_thread.start()


def fast_save(obj, path: str):
    """Serialize ``obj`` (pytree) to ``path`` asynchronously.

    The device->host fetch happens *here* (caller thread) so the saved
    snapshot is consistent; only serialization+disk IO is offloaded.
    Falls back to synchronous save if the queue was never initialized.
    """
    host_obj = jax.tree_util.tree_map(_to_host, obj)
    if _save_queue is None:
        _write_bytes(host_obj, path)
    else:
        _save_queue.put((host_obj, path))


def join_save_queue():
    """Block until all pending saves have been written."""
    if _save_queue is not None:
        _save_queue.join()


def shutdown_save_queue():
    global _save_thread
    if _save_queue is not None and _save_thread is not None:
        _save_queue.put(None)
        _save_queue.join()
        _save_thread = None


def _to_host(x):
    if isinstance(x, jax.Array):
        return np.asarray(jax.device_get(x))
    return x


def _write_bytes(obj, path: str):
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    blob = serialization.msgpack_serialize(_strip_for_msgpack(obj))
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)  # atomic publish


def _strip_for_msgpack(obj):
    """msgpack handles dicts/lists/ndarrays/scalars; normalize everything else."""
    if isinstance(obj, dict):
        return {str(k): _strip_for_msgpack(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_strip_for_msgpack(v) for v in obj]
    if isinstance(obj, jax.Array):
        return np.asarray(jax.device_get(obj))
    return obj


def load_checkpoint(path: str):
    """Load a msgpack checkpoint back into nested dicts of numpy arrays."""
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def save_checkpoint(obj, path: str):
    """Synchronous checkpoint save (for tests / final save)."""
    _write_bytes(jax.tree_util.tree_map(_to_host, obj), path)
