"""Diagnostics: step profiler windowing, debug flags, preemption guard."""

import os
import signal

import pytest

from concepthash_tpu.utils.diagnostics import (
    PreemptionGuard,
    StepProfiler,
    apply_debug_flags,
)


def test_profiler_disabled_is_cheap(tmp_path):
    p = StepProfiler(None, str(tmp_path))
    for _ in range(5):
        p.step_start()
        p.step_end()
    assert len(p.step_times) == 5
    assert not os.path.exists(os.path.join(str(tmp_path), "profile"))


def test_profiler_trace_window(tmp_path):
    import jax
    import jax.numpy as jnp

    p = StepProfiler({"enabled": True, "start_step": 2, "num_steps": 2},
                     str(tmp_path))
    f = jax.jit(lambda x: x * 2)
    for _ in range(6):
        p.step_start()
        f(jnp.ones(4)).block_until_ready()
        p.step_end()
    p.close()
    assert os.path.isdir(p.dir)
    # a trace file landed
    found = any("trace" in fn or fn.endswith(".pb") or fn.endswith(".json.gz")
                for _, _, files in os.walk(p.dir) for fn in files)
    assert found


def test_debug_flags_roundtrip():
    import jax

    apply_debug_flags({"nans": True})
    assert jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", False)
    apply_debug_flags({})  # no-op


def test_preemption_guard_sets_flag():
    g = PreemptionGuard().install()
    try:
        assert not g.should_stop
        os.kill(os.getpid(), signal.SIGTERM)
        assert g.should_stop
    finally:
        g.uninstall()
