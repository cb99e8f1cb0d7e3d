"""Sharded-gallery retrieval: the multi-chip serving path (SURVEY.md §5.8).

The gallery's codes are sharded along the mesh 'data' axis; each chip scores
queries against its shard and keeps a local top-k, then the (ndev * k)
candidates are all-gathered over ICI and re-ranked locally — O(Q * k * ndev)
communication instead of O(Q * N) distances. mAP-style full-ranking metrics
go through ``calculate_mAP`` with a sharded db array instead (XLA inserts the
gather before the global sort).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def shard_gallery(db_codes, mesh: Mesh, axis: str = "data",
                  streaming_block: int = 0):
    """Place (N, nbit) codes sharded over ``axis`` (pads N to the axis size).

    When the shards will be consumed by ``make_sharded_topk(...,
    streaming_block=B)``, pass the same ``B`` here: the streaming engine
    walks each shard in blocks of B rows and requires shard_size % B == 0,
    so N is padded up to a multiple of (axis_size * B)."""
    import numpy as np

    n = db_codes.shape[0]
    size = mesh.shape[axis]
    multiple = size * streaming_block if streaming_block else size
    pad = (-n) % multiple
    if pad:
        # padded rows get all-zero codes at +inf-like distance handled by
        # callers via the returned n
        db_codes = np.concatenate(
            [np.asarray(db_codes),
             np.zeros((pad, db_codes.shape[1]), np.asarray(db_codes).dtype)])
    return jax.device_put(jnp.asarray(db_codes),
                          NamedSharding(mesh, P(axis, None))), n


def make_sharded_topk(mesh: Mesh, k: int, method: str = "mxu",
                      exact: bool = False, axis: str = "data",
                      streaming_block: int = 0, n_valid: int | None = None):
    """Returns fn(query_codes (Q, nbit) replicated, db_sharded (N, nbit))
    -> (distances (Q, k), global indices (Q, k)).

    ``streaming_block`` > 0 switches each shard to the int8 streaming engine
    (ops.retrieval.retrieve_topk_streaming): the gallery shard lives as int8
    signs and is walked in blocks of that size — 100M entries/chip × ndev
    chips on a v5e-8 = an 800M-entry gallery with the same O(Q·k·ndev) ICI
    merge. ``exact`` applies on both paths: the dense path uses the
    hierarchical exact selection in retrieve_topk, the streaming path
    switches its per-block selection from approx_min_k (recall_target
    0.95; measured distance-level recall@100 0.9994 at 10M, PARITY.md) to
    the same hierarchical exact selection — the candidate-union merges
    (per-block and cross-shard) are exact either way. Shards must satisfy
    shard_size % streaming_block == 0: build them with
    shard_gallery(..., streaming_block=...).

    ``n_valid``: the real (pre-pad) row count returned by shard_gallery.
    Pad rows are all-ZERO codes at distance nbit/2 — not inf-like — so
    without masking they can displace real entries in the local top-k and
    surface pad indices >= n_valid in results. Each shard masks its own pad
    tail (derived from axis_index) to +inf inside the selection."""
    from concepthash_tpu.ops.retrieval import retrieve_topk, retrieve_topk_streaming

    def local_fn(q, db_shard):
        # q: (Q, nbit) replicated; db_shard: (N/ndev, nbit) local block, or
        # the 128-lane packed serving layout (ops/topk_select.
        # pack_serving_gallery) holding P = 128//nbit originals per row
        nbit = q.shape[1]
        p_pack = 128 // nbit if (db_shard.shape[1] == 128
                                 and nbit != 128) else 1
        shard = jax.lax.axis_index(axis)
        shard_rows = db_shard.shape[0] * p_pack
        local_valid = (None if n_valid is None else
                       jnp.clip(n_valid - shard * shard_rows, 0, shard_rows))
        if streaming_block or p_pack > 1:
            # packed shards always take the streaming path (one whole-shard
            # block when no streaming_block was asked for): the dense
            # retrieve_topk matmul contracts over nbit and cannot read the
            # 128-lane packed layout
            d, idx = retrieve_topk_streaming(q, db_shard, k=k,
                                             db_block=(streaming_block
                                                       or shard_rows),
                                             exact=exact, n_valid=local_valid)
        else:
            d, idx = retrieve_topk(q, db_shard, k=k, method=method,
                                   exact=exact, n_valid=local_valid)
        gidx = idx + shard * shard_rows
        dd = jax.lax.all_gather(d, axis, axis=1, tiled=True)      # (Q, ndev*k)
        gg = jax.lax.all_gather(gidx, axis, axis=1, tiled=True)
        neg, sel = jax.lax.top_k(-dd, k)
        return -neg, jnp.take_along_axis(gg, sel, axis=1)

    # check_vma=False: outputs ARE replicated (identical all-gather + local
    # re-rank on every shard) but that can't be statically inferred
    return jax.jit(jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(), P(axis, None)),
        out_specs=(P(), P()),
        check_vma=False,
    ))
