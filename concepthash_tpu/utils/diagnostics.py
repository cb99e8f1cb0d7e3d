"""Diagnostics subsystems the reference lacks (SURVEY.md §5.1-5.3):

  - opt-in jax.profiler trace capture around a step window
  - debug mode: nan-checking / jit-disable via config
  - preemption handling: SIGTERM/SIGINT triggers a final checkpoint before
    exit (TPU preemption recovery = resume-from-last, SURVEY.md §5.3)
"""

from __future__ import annotations

import logging
import os
import signal
import time
from contextlib import contextmanager


class StepProfiler:
    """Captures a jax.profiler trace for steps [start, start+num) and tracks
    host-side step latencies. Config: ``profile: {enabled, start_step,
    num_steps, dir}``."""

    def __init__(self, cfg: dict | None, logdir: str):
        cfg = cfg or {}
        self.enabled = bool(cfg.get("enabled", False))
        self.start_step = int(cfg.get("start_step", 10))
        self.num_steps = int(cfg.get("num_steps", 5))
        self.dir = cfg.get("dir") or os.path.join(logdir, "profile")
        self._active = False
        self._step = 0
        self._t0 = None
        self.step_times: list[float] = []

    def step_start(self):
        self._t0 = time.perf_counter()
        if self.enabled and self._step == self.start_step and not self._active:
            import jax

            os.makedirs(self.dir, exist_ok=True)
            jax.profiler.start_trace(self.dir)
            self._active = True
            logging.info("profiler trace started at step %d -> %s",
                         self._step, self.dir)

    def step_end(self):
        if self._t0 is not None:
            self.step_times.append(time.perf_counter() - self._t0)
        self._step += 1
        if self._active and self._step >= self.start_step + self.num_steps:
            import jax

            jax.profiler.stop_trace()
            self._active = False
            logging.info("profiler trace stopped at step %d", self._step)

    def close(self):
        if self._active:
            import jax

            jax.profiler.stop_trace()
            self._active = False


def apply_debug_flags(cfg: dict | None):
    """``debug: {nans, disable_jit}`` -> jax config (SURVEY.md §5.2)."""
    cfg = cfg or {}
    if not cfg:
        return
    import jax

    if cfg.get("nans"):
        jax.config.update("jax_debug_nans", True)
        logging.info("debug: jax_debug_nans enabled")
    if cfg.get("disable_jit"):
        jax.config.update("jax_disable_jit", True)
        logging.info("debug: jit disabled")


class PreemptionGuard:
    """Installs SIGTERM/SIGINT handlers that request a graceful stop; the
    training loop checks ``should_stop`` each epoch/step and saves 'last'
    before exiting, so preempted TPU jobs resume via resume_logdir."""

    def __init__(self):
        self.should_stop = False
        self._installed = False
        self._prev = {}

    def install(self):
        if self._installed:
            return self
        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                self._prev[sig] = signal.signal(sig, self._handler)
            except ValueError:  # not main thread
                return self
        self._installed = True
        return self

    def _handler(self, signum, frame):
        logging.warning("signal %s received: checkpoint-and-stop requested",
                        signum)
        self.should_stop = True

    def uninstall(self):
        for sig, prev in self._prev.items():
            signal.signal(sig, prev)
        self._installed = False


@contextmanager
def guarded_training():
    guard = PreemptionGuard().install()
    try:
        yield guard
    finally:
        guard.uninstall()
