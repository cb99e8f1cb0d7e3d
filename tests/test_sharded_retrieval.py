"""Sharded-gallery retrieval over the 8-device mesh: distributed top-k merge
equals single-device exact retrieval; sharded mAP equals unsharded."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from concepthash_tpu.ops.retrieval import calculate_mAP, retrieve_topk
from concepthash_tpu.ops.sharded import make_sharded_topk, shard_gallery
from concepthash_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def mesh():
    return make_mesh()


def test_sharded_topk_matches_exact(rng, mesh):
    N, Q, nbit, k = 640, 16, 32, 10
    db = np.sign(rng.standard_normal((N, nbit))).astype(np.float32)
    q = rng.standard_normal((Q, nbit)).astype(np.float32)

    db_sharded, n_real = shard_gallery(db, mesh)
    assert n_real == N
    fn = make_sharded_topk(mesh, k=k, exact=True)
    d_sh, idx_sh = fn(jnp.asarray(q), db_sharded)

    d_ref, idx_ref = retrieve_topk(q, db, k=k, method="mxu", exact=True)
    np.testing.assert_allclose(np.asarray(d_sh), np.asarray(d_ref), atol=1e-4)
    # distance multisets must agree even when ties reorder indices:
    # recompute distances of the returned indices
    full = 0.5 * (nbit - np.sign(q) @ np.sign(db).T)
    got = np.take_along_axis(full, np.asarray(idx_sh), axis=1)
    np.testing.assert_allclose(np.sort(got, 1), np.sort(np.asarray(d_ref), 1),
                               atol=1e-4)


def test_sharded_gallery_padding(rng, mesh):
    N = 637  # not divisible by 8
    db = np.sign(rng.standard_normal((N, 16))).astype(np.float32)
    db_sharded, n_real = shard_gallery(db, mesh)
    assert n_real == N
    assert db_sharded.shape[0] == 640


def test_sharded_topk_n_valid_masks_pads(rng, mesh):
    """shard_gallery pad rows (all-zero codes at distance nbit/2) must not
    displace real entries or surface pad indices when n_valid is passed —
    every real row sits at distance nbit, so unmasked pads would win."""
    N, Q, nbit, k = 637, 4, 16, 5                     # pads 637 -> 640
    db = np.full((N, nbit), -1.0, np.float32)
    q = np.ones((Q, nbit), np.float32)

    db_sharded, n_real = shard_gallery(db, mesh)
    assert n_real == N
    for exact in (False, True):
        fn = make_sharded_topk(mesh, k=k, exact=exact, n_valid=n_real)
        d, idx = fn(jnp.asarray(q), db_sharded)
        assert np.asarray(idx).max() < N, f"pad index surfaced (exact={exact})"
        np.testing.assert_allclose(np.asarray(d), float(nbit))

    # streaming engine path: same contract
    db_st, n_real = shard_gallery(db.astype(np.int8), mesh, streaming_block=20)
    fn = make_sharded_topk(mesh, k=k, streaming_block=20, exact=True,
                           n_valid=n_real)
    d, idx = fn(jnp.asarray(q), db_st)
    assert np.asarray(idx).max() < N
    np.testing.assert_allclose(np.asarray(d), float(nbit))


def test_map_with_sharded_db_matches(rng, mesh):
    N, Q, nbit = 64, 16, 16
    db = rng.standard_normal((N, nbit)).astype(np.float32)
    q = rng.standard_normal((Q, nbit)).astype(np.float32)
    dbl = np.eye(4, dtype=np.float32)[rng.integers(0, 4, N)]
    ql = np.eye(4, dtype=np.float32)[rng.integers(0, 4, Q)]

    ref = calculate_mAP(db, dbl, q, ql, R=-1, PRs=(1, 5))

    db_dev = jax.device_put(jnp.asarray(db), NamedSharding(mesh, P("data", None)))
    dbl_dev = jax.device_put(jnp.asarray(dbl), NamedSharding(mesh, P("data", None)))
    sh = calculate_mAP(db_dev, dbl_dev, q, ql, R=-1, PRs=(1, 5))

    assert sh[0] == pytest.approx(ref[0], abs=1e-6)
    np.testing.assert_allclose(sh[1], ref[1], atol=1e-6)
    np.testing.assert_allclose(sh[2], ref[2], atol=1e-6)


def test_sharded_streaming_topk_matches_exact(rng, mesh):
    """Streaming int8 engine per shard (streaming_block>0) + ICI merge
    equals single-device exact retrieval — the 8×100M-entry composition."""
    N, Q, nbit, k = 1024, 8, 32, 10
    db = np.sign(rng.standard_normal((N, nbit))).astype(np.float32)
    db[db == 0] = 1.0
    q = np.sign(rng.standard_normal((Q, nbit))).astype(np.float32)

    db_sharded, n_real = shard_gallery(db.astype(np.int8), mesh,
                                       streaming_block=32)
    assert n_real == N
    fn = make_sharded_topk(mesh, k=k, streaming_block=32)  # 4 blocks/shard
    d_sh, idx_sh = fn(jnp.asarray(q), db_sharded)

    d_ref, _ = retrieve_topk(q, db, k=k, method="mxu", exact=True)
    np.testing.assert_allclose(np.sort(np.asarray(d_sh), 1),
                               np.sort(np.asarray(d_ref), 1), atol=1e-4)
    # returned global indices really have the returned distances
    full = 0.5 * (nbit - q @ db.T)
    got = np.take_along_axis(full, np.asarray(idx_sh), axis=1)
    np.testing.assert_allclose(got, np.asarray(d_sh), atol=1e-4)

    # exact=True on the streaming path: per-shard hierarchical exact
    # selection + exact merges must reproduce the exact distance multiset
    fn_ex = make_sharded_topk(mesh, k=k, streaming_block=32, exact=True)
    d_ex, idx_ex = fn_ex(jnp.asarray(q), db_sharded)
    np.testing.assert_array_equal(np.sort(np.asarray(d_ex), 1),
                                  np.sort(np.asarray(d_ref), 1))
    got = np.take_along_axis(full, np.asarray(idx_ex), axis=1)
    np.testing.assert_allclose(got, np.asarray(d_ex), atol=1e-4)


def test_sharded_streaming_packed_exact(rng, mesh):
    """A 128-lane PACKED gallery sharded over the mesh: per-shard streaming
    exact + ICI merge equals dense exact, with correct global indices
    (shard offset scales by the P originals-per-packed-row factor)."""
    from concepthash_tpu.ops.topk_select import pack_serving_gallery

    N, Q, nbit, k = 4096, 8, 32, 10      # P = 4 -> 1024 packed rows
    db = np.sign(rng.standard_normal((N, nbit))).astype(np.float32)
    db[db == 0] = 1.0
    q = np.sign(rng.standard_normal((Q, nbit))).astype(np.float32)
    packed, n_pad = pack_serving_gallery(db)
    assert n_pad == N

    # shard the PACKED rows; streaming_block counts ORIGINAL rows, so the
    # per-shard packed row count must be a multiple of block//P
    db_sh, _ = shard_gallery(np.asarray(packed), mesh, streaming_block=64)
    fn = make_sharded_topk(mesh, k=k, streaming_block=256, exact=True)
    d_sh, idx_sh = fn(jnp.asarray(q), db_sh)

    d_ref, _ = retrieve_topk(q, db, k=k, method="mxu", exact=True)
    np.testing.assert_array_equal(np.sort(np.asarray(d_sh), 1),
                                  np.sort(np.asarray(d_ref), 1))
    full = 0.5 * (nbit - q @ db.T)
    got = np.take_along_axis(full, np.asarray(idx_sh), axis=1)
    np.testing.assert_allclose(got, np.asarray(d_sh), atol=1e-4)


def test_sharded_packed_dense_path(rng, mesh):
    """A PACKED gallery with streaming_block=0 (the 'dense' configuration):
    the dense retrieve_topk cannot read the 128-lane layout, so local_fn
    must route through a one-block streaming call instead of crashing at
    trace (round-4 review finding). Exact and approximate both."""
    from concepthash_tpu.ops.topk_select import pack_serving_gallery

    N, Q, nbit, k = 4096, 8, 32, 10
    db = np.sign(rng.standard_normal((N, nbit))).astype(np.float32)
    db[db == 0] = 1.0
    q = np.sign(rng.standard_normal((Q, nbit))).astype(np.float32)
    packed, n_pad = pack_serving_gallery(db)
    assert n_pad == N

    db_sh, _ = shard_gallery(np.asarray(packed), mesh)
    for exact in (True, False):
        fn = make_sharded_topk(mesh, k=k, exact=exact)   # streaming_block=0
        d_sh, idx_sh = fn(jnp.asarray(q), db_sh)
        d_ref, _ = retrieve_topk(q, db, k=k, method="mxu", exact=True)
        if exact:
            np.testing.assert_array_equal(np.sort(np.asarray(d_sh), 1),
                                          np.sort(np.asarray(d_ref), 1))
        full = 0.5 * (nbit - q @ db.T)
        got = np.take_along_axis(full, np.asarray(idx_sh), axis=1)
        np.testing.assert_allclose(got, np.asarray(d_sh), atol=1e-4)
