"""Device-mesh setup for ICI-scale data parallelism + sharded retrieval.

The reference is single-process single-GPU (SURVEY.md §2 parallelism census);
the TPU-native equivalents are built here as first-class components: a global
mesh with a 'data' axis (primary) and an optional 'model' axis reserved for
sharding very large class-center/codebook matmuls. Multi-host entry goes
through ``jax.distributed.initialize`` (no-op on one host).
"""

from __future__ import annotations

import logging
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed():
    """Initialize multi-host JAX if running under a multi-process launcher."""
    import os

    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()
        logging.info("jax.distributed initialized: process %d/%d",
                     jax.process_index(), jax.process_count())


def make_mesh(n_devices: Optional[int] = None, model_axis: int = 1,
              devices=None) -> Mesh:
    """1-D 'data' mesh by default; pass model_axis>1 for a ('data','model')
    grid (class-center sharding for very wide codebooks)."""
    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if model_axis > 1:
        assert n % model_axis == 0
        grid = np.array(devices).reshape(n // model_axis, model_axis)
        return Mesh(grid, ("data", "model"))
    return Mesh(np.array(devices), ("data",))


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place a host batch onto the mesh, sharded along 'data'."""
    sharding = NamedSharding(mesh, P("data"))
    return {k: jax.device_put(v, sharding) for k, v in batch.items()}


def shard_batch_chunk(batches: dict, mesh: Mesh) -> dict:
    """Place a stacked chunk of batches (leaves (K, B, ...)) onto the mesh:
    the scan axis K is unsharded, the batch axis is sharded along 'data'."""
    sharding = NamedSharding(mesh, P(None, "data"))
    return {k: jax.device_put(v, sharding) for k, v in batches.items()}


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def pad_to_multiple(batch: dict, multiple: int):
    """Pad the batch dim to a device-count multiple; returns (batch, n_real).

    JAX needs static shapes; the reference relies on a variable last batch
    (engine.py:48-53) — we pad and mask instead (SURVEY.md §7 hard-part 6).
    """
    n = next(iter(batch.values())).shape[0]
    pad = (-n) % multiple
    if pad == 0:
        return batch, n
    out = {}
    for k, v in batch.items():
        width = [(0, pad)] + [(0, 0)] * (v.ndim - 1)
        out[k] = np.pad(np.asarray(v), width)
    return out, n
