#!/bin/bash
# Round-4 TPU measurement runbook — run the moment the relay answers
# (watch: timeout 90 python -c "import jax; print((jax.numpy.ones((8,8))@jax.numpy.ones((8,8))).sum())").
# ONE TPU process at a time (CLAUDE.md); stages ordered by value.
set -ex
cd /root/repo
mkdir -p logs/r4_tpu

# 1. 100M exact serving under cap2=kk + free theta_next (expected ~2.5-3k
#    qps from 1,221; PARITY.md round-5 item 4)
timeout 1800 python scripts/probe_minspass.py 2>&1 \
  | tee logs/r4_tpu/probe_minspass_100m.log

# 2. 10M point for the bench field cross-check
N_DB=1e7 timeout 900 python scripts/probe_minspass.py 2>&1 \
  | tee logs/r4_tpu/probe_minspass_10m.log

# 3. full bench rehearsal exactly as the driver runs it
timeout 1400 python bench.py 2> logs/r4_tpu/bench.err \
  | tee logs/r4_tpu/bench.out

tail -1 logs/r4_tpu/bench.out
