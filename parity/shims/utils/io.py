"""Async checkpoint writer (reference call sites: train_helper.py:49,299;
trainers/base.py:184-193 — init_save_queue / fast_save / join_save_queue)."""

from __future__ import annotations

import os
import queue
import threading

import torch

_queue: "queue.Queue | None" = None
_thread: "threading.Thread | None" = None


def _worker():
    while True:
        item = _queue.get()
        if item is None:
            return
        obj, fn = item
        os.makedirs(os.path.dirname(os.path.abspath(fn)), exist_ok=True)
        torch.save(obj, fn)
        _queue.task_done()


def init_save_queue():
    global _queue, _thread
    if _queue is None:
        _queue = queue.Queue()
        _thread = threading.Thread(target=_worker, daemon=True)
        _thread.start()


def fast_save(obj, fn: str):
    if _queue is None:
        init_save_queue()
    _queue.put((obj, fn))


def join_save_queue():
    if _queue is not None:
        _queue.join()
