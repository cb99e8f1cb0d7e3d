"""bench.py hang-guard regression tests (VERDICT r3 weak-1 follow-through).

The driver's per-round bench capture must NEVER end with an empty record:
BENCH_r03 was lost when a relay stage hung past the timeout, and the r4
rehearsal showed the relay can hang INSIDE backend init, where a SIGALRM
handler never runs. bench.py's defenses: a killable subprocess probe before
any in-process backend touch, an all-null record emitted first, and a
watchdog thread that force-emits and exits 0 at budget+90s.

These tests drive the real script as a subprocess the way the driver does,
with a tiny probe timeout and an already-expired budget, and assert the
contract the driver depends on: exit code 0 and a parseable final JSON line.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


@pytest.mark.slow
def test_expired_budget_still_emits_parseable_record():
    """budget < 0: every stage is skipped or the watchdog fires first —
    either way rc=0 and the last stdout line is a complete JSON record."""
    env = dict(os.environ,
               BENCH_BUDGET_S="-500", BENCH_PROBE_TIMEOUT_S="5")
    p = subprocess.run([sys.executable, BENCH, "--smoke"], env=env,
                       capture_output=True, text=True, timeout=420)
    assert p.returncode == 0, p.stderr[-2000:]
    lines = [ln for ln in p.stdout.splitlines() if ln.strip()]
    assert lines, "no output at all"
    rec = json.loads(lines[-1])
    assert rec["metric"].startswith("hamming64_retrieval_qps")
    assert "skipped_stages" in rec
    # nothing measured: either the watchdog fired or all stages skipped
    assert rec["value"] is None
    assert (("WATCHDOG_FIRED" in rec["skipped_stages"])
            or len(rec["skipped_stages"]) > 0)
    # every emitted line must be independently parseable (incremental
    # contract: the driver takes the LAST line, whatever it is)
    for ln in lines:
        json.loads(ln)


@pytest.mark.slow
def test_unreachable_probe_falls_back_without_hanging():
    """A probe that cannot find a live TPU (tiny timeout guarantees it even
    if a TPU exists) must degrade to tpu_relay_down=true, never hang."""
    env = dict(os.environ,
               BENCH_BUDGET_S="30", BENCH_PROBE_TIMEOUT_S="1")
    p = subprocess.run([sys.executable, BENCH, "--smoke"], env=env,
                       capture_output=True, text=True, timeout=420)
    assert p.returncode == 0, p.stderr[-2000:]
    lines = [ln for ln in p.stdout.splitlines() if ln.strip()]
    rec = json.loads(lines[-1])
    assert rec["tpu_relay_down"] is True
    assert rec["backend"] in (None, "cpu")


def test_device_loop_matches_headline_workload_semantics():
    """bench_retrieval_device_loop runs the headline workload on-device
    (fori repeats + lax.map over chunks) and must return a finite positive
    qps on CPU at tiny sizes — guards the fused program against trace-time
    regressions (roll/reshape/map composition) without needing the TPU."""
    sys.path.insert(0, REPO)
    import bench as B
    import jax
    import jax.numpy as jnp

    qps = B.bench_retrieval_device_loop(jnp, jax, n_db=2048, n_q=256,
                                        topk=10, chunk=128, repeats=2)
    assert np.isfinite(qps) and qps > 0


def test_relay_rtt_measure_runs_on_cpu():
    sys.path.insert(0, REPO)
    import bench as B
    import jax
    import jax.numpy as jnp

    rtt = B.bench_relay_rtt(jnp, jax, iters=3)
    assert np.isfinite(rtt) and rtt >= 0
