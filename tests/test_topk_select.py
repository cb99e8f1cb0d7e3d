"""Fused mins-pass exact top-k (ops/topk_select.py): kernel semantics in
interpret mode on CPU, the exactness certificate, and the streaming wiring."""

import numpy as np
import pytest

import jax.numpy as jnp

from concepthash_tpu.ops.topk_select import (subblock_min_dists,
                                             _mins_reference,
                                             exact_topk_minspass)


@pytest.fixture
def rng():
    return np.random.default_rng(11)


def _signs(rng, n, nbit):
    s = np.sign(rng.standard_normal((n, nbit))).astype(np.float32)
    s[s == 0] = 1.0
    return s


def _oracle_dist(q, db):
    return 0.5 * (q.shape[1] - q @ db.T)


def test_subblock_mins_matches_oracle(rng):
    """Pallas kernel (interpret) == jnp reference == numpy oracle, including
    N not a multiple of the subblock or of the row-block (mask path)."""
    nbit, S, Q = 32, 8, 16
    for N in (256, 250, 131):           # multiple, S-ragged, block-ragged
        q = _signs(rng, Q, nbit)
        db = _signs(rng, N, nbit).astype(np.int8)
        got = np.asarray(subblock_min_dists(
            jnp.asarray(q), jnp.asarray(db), subblock=S, block_rows=64,
            interpret=True))
        ref = np.asarray(_mins_reference(
            jnp.asarray(np.sign(q).astype(np.int8)), jnp.asarray(db), S,
            got.shape[0]))
        np.testing.assert_array_equal(got, ref)
        # numpy oracle on the real rows
        dist = _oracle_dist(q, db.astype(np.float32))
        m_real = -(-N // S)
        pad = m_real * S - N
        if pad:
            dist = np.concatenate(
                [dist, np.full((Q, pad), nbit + 1.0, np.float32)], axis=1)
        mins_np = dist.reshape(Q, m_real, S).min(-1)        # (Q, m)
        np.testing.assert_array_equal(got[:m_real].T, mins_np)
        # padded tail rows (beyond m_real) must be worse than any real dist
        assert got[m_real:].min() > nbit if got.shape[0] > m_real else True


def test_exact_minspass_matches_oracle(rng):
    """On sign-code data the certificate holds and the result equals the
    exact top-k distance multiset; indices map back to the distances."""
    nbit, k = 64, 5
    Q, N = 8, 3000
    q = _signs(rng, Q, nbit)
    db = _signs(rng, N, nbit).astype(np.int8)
    d, idx, valid = exact_topk_minspass(jnp.asarray(q), jnp.asarray(db),
                                        k=k, subblock=8, cap=64,
                                        interpret=True)
    dist = _oracle_dist(q, db.astype(np.float32))
    ref = np.sort(dist, 1)[:, :k]
    d, idx = np.asarray(d), np.asarray(idx)
    if bool(valid):
        np.testing.assert_array_equal(d, ref)
    # returned entries are genuine regardless of the certificate
    np.testing.assert_array_equal(
        np.take_along_axis(dist, idx, axis=1), d)
    assert idx.min() >= 0 and idx.max() < N


def test_certificate_fails_on_tie_floods(rng):
    """All-identical db codes -> every distance ties -> the k-th value can
    never be strictly below an unselected subblock min -> valid MUST be
    False (the caller falls back)."""
    nbit, k = 16, 3
    q = _signs(rng, 4, nbit)
    db = np.tile(_signs(rng, 1, nbit), (2000, 1)).astype(np.int8)
    d, idx, valid = exact_topk_minspass(jnp.asarray(q), jnp.asarray(db),
                                        k=k, subblock=8, cap=16,
                                        interpret=True)
    assert not bool(valid)


def test_minspass_large_m_branch_matches_oracle(rng, monkeypatch):
    """The large-m inner selection (hierarchical, no fallback, exact
    theta_next via scatter+min) — forced by shrinking _INNER_DIRECT_MAX —
    returns the exact top-k whenever its certificate passes, and the
    certificate must FAIL (never lie) on tie floods."""
    import concepthash_tpu.ops.topk_select as ts

    monkeypatch.setattr(ts, "_INNER_DIRECT_MAX", 16)
    nbit, k, Q, N = 64, 5, 6, 3000            # m = 375 >> 16 -> approx branch
    q = _signs(rng, Q, nbit)
    db = _signs(rng, N, nbit).astype(np.int8)
    d, idx, valid = ts.exact_topk_minspass(jnp.asarray(q), jnp.asarray(db),
                                           k=k, subblock=8, cap=64,
                                           interpret=True)
    dist = _oracle_dist(q, db.astype(np.float32))
    if bool(valid):
        np.testing.assert_array_equal(np.asarray(d), np.sort(dist, 1)[:, :k])
    np.testing.assert_array_equal(
        np.take_along_axis(dist, np.asarray(idx), axis=1), np.asarray(d))

    # tie flood: every distance identical -> certificate must fail
    db2 = np.tile(_signs(rng, 1, nbit), (3000, 1)).astype(np.int8)
    _, _, v2 = ts.exact_topk_minspass(jnp.asarray(q), jnp.asarray(db2),
                                      k=k, subblock=8, cap=64, interpret=True)
    assert not bool(v2)

    # fuzz across tie regimes on the forced branch
    for trial in range(4):
        if trial % 2:
            base = _signs(rng, 40, nbit)
            dbf = base[rng.integers(0, 40, 2500)].astype(np.int8)
        else:
            dbf = _signs(rng, 2500, nbit).astype(np.int8)
        d, idx, valid = ts.exact_topk_minspass(jnp.asarray(q),
                                               jnp.asarray(dbf), k=7,
                                               subblock=8, cap=32,
                                               interpret=True)
        distf = _oracle_dist(q, dbf.astype(np.float32))
        if bool(valid):
            np.testing.assert_array_equal(np.asarray(d),
                                          np.sort(distf, 1)[:, :7],
                                          err_msg=f"trial {trial}")
        np.testing.assert_array_equal(
            np.take_along_axis(distf, np.asarray(idx), axis=1),
            np.asarray(d))


def test_approx_smallest_rows_coverage_guarantee(rng):
    """The i-th smallest value is ALWAYS selected for i <= cap2: values
    #1..#i-1 occupy < cap2 superblocks, so #i's superblock (min <= value_i)
    ranks within the top cap2 — the guarantee the exactness certificate in
    exact_topk_minspass leans on. Indices are unique and in range."""
    from concepthash_tpu.ops.topk_select import _approx_smallest_rows

    x = rng.standard_normal((5, 1000)).astype(np.float32)
    idx = np.asarray(_approx_smallest_rows(jnp.asarray(x), 20, sub2=8,
                                           cap2=16))
    assert idx.shape == (5, 20)
    for q in range(5):
        assert len(set(idx[q])) == 20 and idx[q].min() >= 0 \
            and idx[q].max() < 1000
        smallest16 = set(np.argsort(x[q])[:16])
        assert smallest16 <= set(idx[q])


def test_approx_smallest_rows_theta_is_exact_unselected_min(rng):
    """return_theta must equal the EXACT min over each row's unselected
    entries (the scatter-inf + full-min oracle it replaced), across tie
    regimes (half-integer Hamming-like values), a non-sub2-multiple width
    (inf pads), and the all-superblocks-selected edge (cap2 >= m2)."""
    from concepthash_tpu.ops.topk_select import _approx_smallest_rows

    for trial, (m, sub2, kk, cap2, tie) in enumerate([
            (1000, 8, 20, 16, False),
            (997, 8, 20, 16, True),       # pad + heavy ties
            (64, 8, 8, 8, True),          # cap2 == m2: no unselected sb
            (1203, 16, 33, None, True),   # default cap2 = kk
    ]):
        if tie:
            x = (rng.integers(0, 12, (5, m)) * 0.5).astype(np.float32)
        else:
            x = rng.standard_normal((5, m)).astype(np.float32)
        idx, theta = _approx_smallest_rows(jnp.asarray(x), kk, sub2=sub2,
                                           cap2=cap2, return_theta=True)
        idx, theta = np.asarray(idx), np.asarray(theta)
        for q in range(5):
            masked = x[q].copy()
            masked[idx[q]] = np.inf
            want = masked.min()
            assert theta[q] == want, (trial, q, theta[q], want)
        # and the no-theta call returns the identical selection
        idx2 = np.asarray(_approx_smallest_rows(jnp.asarray(x), kk,
                                                sub2=sub2, cap2=cap2))
        np.testing.assert_array_equal(idx, idx2)


def test_minspass_n_valid_masks_pads(rng):
    """Pad rows that are CLOSER than every real row (all-zero codes when the
    queries are far from the whole real gallery) must be masked out by
    n_valid on both the hierarchical and the dense-rescore branches."""
    nbit, k, Q = 16, 4, 3
    q = np.ones((Q, nbit), np.float32)
    n_real = 2990
    db = np.concatenate([np.full((n_real, nbit), -1.0, np.float32),
                         np.zeros((10, nbit), np.float32)]).astype(np.int8)
    # hierarchical branch (m > cap)
    d, idx, valid = exact_topk_minspass(jnp.asarray(q), jnp.asarray(db), k=k,
                                        subblock=8, cap=64, interpret=True,
                                        n_valid=n_real)
    assert np.asarray(idx).max() < n_real
    np.testing.assert_array_equal(np.asarray(d), float(nbit))
    # dense branch (m <= cap)
    d2, idx2, v2 = exact_topk_minspass(jnp.asarray(q), jnp.asarray(db), k=k,
                                       subblock=8, cap=512, interpret=True,
                                       n_valid=n_real)
    assert bool(v2) and np.asarray(idx2).max() < n_real
    np.testing.assert_array_equal(np.asarray(d2), float(nbit))


def test_streaming_exact_uses_minspass_and_matches(rng):
    """retrieve_topk_streaming(exact=True) (which routes through the fused
    mins pass + certificate fallback) equals the dense exact result."""
    from concepthash_tpu.ops.retrieval import retrieve_topk, retrieve_topk_streaming

    nbit, k = 32, 7
    Q, N = 6, 4096
    q = _signs(rng, Q, nbit)
    db = _signs(rng, N, nbit)
    d_ref, _ = retrieve_topk(jnp.asarray(q), jnp.asarray(db), k=k, exact=True)
    d_st, i_st = retrieve_topk_streaming(jnp.asarray(q),
                                         jnp.asarray(db, jnp.int8),
                                         k=k, db_block=1024, exact=True)
    np.testing.assert_array_equal(np.sort(np.asarray(d_st), 1),
                                  np.sort(np.asarray(d_ref), 1))
    dist = _oracle_dist(q, db)
    np.testing.assert_array_equal(
        np.take_along_axis(dist, np.asarray(i_st), axis=1),
        np.asarray(d_st))


def test_packed_gallery_roundtrip_and_mins(rng):
    """pack_serving_gallery packs P=128//nbit rows per 128-lane row; the
    packed mins kernel (interpret) equals the plain-layout reference on the
    same logical gallery, including pack padding (zero rows at nbit/2)."""
    from concepthash_tpu.ops.topk_select import (pack_serving_gallery,
                                                 subblock_min_dists_packed)

    nbit, S, Q = 32, 8, 16           # P = 4
    N = 203                          # ragged: pack pads to 204
    q = _signs(rng, Q, nbit)
    db = _signs(rng, N, nbit)
    packed, n_pad = pack_serving_gallery(db)
    assert packed.shape == (n_pad // 4, 128) and n_pad == 204
    # packing is a row-major reshape: bytes identical
    np.testing.assert_array_equal(
        np.asarray(packed).reshape(n_pad, nbit)[:N],
        np.sign(db).astype(np.int8))

    got = np.asarray(subblock_min_dists_packed(
        jnp.asarray(q), packed, subblock=S, block_rows2=32, interpret=True))
    # oracle over the PADDED gallery (pad rows are zero codes, dist nbit/2)
    dbp = np.concatenate([db, np.zeros((n_pad - N, nbit), np.float32)])
    dist = 0.5 * (nbit - q @ np.sign(dbp).T)
    m_real = n_pad // S if n_pad % S == 0 else -(-n_pad // S)
    pad = m_real * S - n_pad
    if pad:
        dist = np.concatenate(
            [dist, np.full((Q, pad), nbit + 1.0, np.float32)], axis=1)
    mins_np = dist.reshape(Q, m_real, S).min(-1)
    np.testing.assert_array_equal(got[:m_real].T, mins_np)


def test_minspass_packed_equals_plain(rng):
    """exact_topk_minspass gives identical results on the packed and plain
    layouts of the same gallery (pack-pad rows count as zero-code
    entries, matching the shard_gallery padding convention)."""
    from concepthash_tpu.ops.topk_select import pack_serving_gallery

    nbit, k = 32, 5
    Q, N = 8, 3000                   # P = 4, N % 4 == 0 -> no pack pad
    q = _signs(rng, Q, nbit)
    db = _signs(rng, N, nbit).astype(np.int8)
    packed, n_pad = pack_serving_gallery(db)
    assert n_pad == N
    d0, i0, v0 = exact_topk_minspass(jnp.asarray(q), jnp.asarray(db),
                                     k=k, subblock=8, cap=64, interpret=True)
    d1, i1, v1 = exact_topk_minspass(jnp.asarray(q), packed,
                                     k=k, subblock=8, cap=64, interpret=True)
    assert bool(v0) == bool(v1)
    np.testing.assert_array_equal(np.asarray(d0), np.asarray(d1))
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))


def test_streaming_exact_packed_matches(rng):
    """retrieve_topk_streaming(exact=True) on a PACKED gallery equals the
    dense exact result (fast path and fallback both packed-aware)."""
    from concepthash_tpu.ops.retrieval import retrieve_topk, retrieve_topk_streaming
    from concepthash_tpu.ops.topk_select import pack_serving_gallery

    nbit, k = 32, 7
    Q, N = 6, 4096
    q = _signs(rng, Q, nbit)
    db = _signs(rng, N, nbit)
    packed, n_pad = pack_serving_gallery(db)
    assert n_pad == N
    d_ref, _ = retrieve_topk(jnp.asarray(q), jnp.asarray(db), k=k, exact=True)
    for exact in (True, False):
        d_st, i_st = retrieve_topk_streaming(jnp.asarray(q), packed,
                                             k=k, db_block=1024, exact=exact)
        if exact:
            np.testing.assert_array_equal(np.sort(np.asarray(d_st), 1),
                                          np.sort(np.asarray(d_ref), 1))
        dist = _oracle_dist(q, db)
        np.testing.assert_array_equal(
            np.take_along_axis(dist, np.asarray(i_st), axis=1),
            np.asarray(d_st))


def test_exact_paths_fuzz_agree(rng):
    """Property fuzz: across random shapes, k values, tie regimes, and both
    gallery layouts, every exact path (dense hier, minspass+certificate,
    streaming) returns the full-sort distance multiset."""
    import jax.numpy as jnp
    from concepthash_tpu.ops.retrieval import (exact_topk_blocked,
                                               retrieve_topk_streaming)
    from concepthash_tpu.ops.topk_select import pack_serving_gallery

    for trial in range(6):
        nbit = int(rng.choice([16, 32, 64]))
        Q = int(rng.integers(1, 9))
        N = int(rng.integers(700, 5000))
        k = int(rng.integers(1, 20))
        if rng.random() < 0.5:          # tie-heavy regime (integer dists)
            db = _signs(rng, N, nbit)
        else:                            # duplicate-row floods
            base = _signs(rng, max(4, N // 8), nbit)
            db = base[rng.integers(0, base.shape[0], N)]
        q = _signs(rng, Q, nbit)
        dist = _oracle_dist(q, db)
        ref = np.sort(dist, 1)[:, :k]

        d1, i1 = exact_topk_blocked(jnp.asarray(dist), k,
                                    subblock=16, cap=32)
        np.testing.assert_array_equal(np.asarray(d1), ref,
                                      err_msg=f"hier trial {trial}")
        np.testing.assert_array_equal(
            np.take_along_axis(dist, np.asarray(i1), 1), np.asarray(d1))

        d2, i2, v2 = exact_topk_minspass(jnp.asarray(q),
                                         jnp.asarray(db, jnp.int8), k,
                                         subblock=16, cap=32,
                                         interpret=True)
        if bool(v2):
            np.testing.assert_array_equal(np.sort(np.asarray(d2), 1), ref,
                                          err_msg=f"minspass trial {trial}")
        np.testing.assert_array_equal(
            np.take_along_axis(dist, np.asarray(i2), 1), np.asarray(d2))

        blk = int(rng.choice([128, 256]))
        Npad = -(-N // blk) * blk
        dbp = np.concatenate([db, np.zeros((Npad - N, nbit), np.float32)])
        distp = _oracle_dist(q, np.sign(dbp))
        refp = np.sort(distp, 1)[:, :k]
        packed, n_pk = pack_serving_gallery(dbp)
        d3, i3 = retrieve_topk_streaming(jnp.asarray(q), packed, k=k,
                                         db_block=blk, exact=True)
        np.testing.assert_array_equal(np.sort(np.asarray(d3), 1), refp,
                                      err_msg=f"streaming trial {trial}")
        np.testing.assert_array_equal(
            np.take_along_axis(distp, np.asarray(i3), 1), np.asarray(d3))

        # n_valid masks the zero-code pad rows: result == top-k over the
        # REAL rows only, no pad index ever surfaces
        d4, i4 = retrieve_topk_streaming(jnp.asarray(q), packed, k=k,
                                         db_block=blk, exact=True, n_valid=N)
        np.testing.assert_array_equal(np.sort(np.asarray(d4), 1), ref,
                                      err_msg=f"n_valid trial {trial}")
        assert np.asarray(i4).max() < N


def test_bits_rescore_equals_int8_rescore(rng):
    """The bit-packed candidate rescore (db_bits from pack_bits_serving,
    XOR+popcount) returns bit-identical results to the int8 sign-dot
    rescore across tie regimes, layouts, and n_valid masking."""
    from concepthash_tpu.ops.topk_select import (pack_bits_serving,
                                                 pack_serving_gallery)

    nbit, k, Q = 64, 9, 5
    q = _signs(rng, Q, nbit)
    for trial in range(4):
        if trial % 2:
            base = _signs(rng, 30, nbit)
            db = base[rng.integers(0, 30, 2000)].astype(np.int8)
        else:
            db = _signs(rng, 2000, nbit).astype(np.int8)
        bits = pack_bits_serving(jnp.asarray(db), nbit)
        kw = dict(k=k, subblock=8, cap=32, interpret=True)
        d0, i0, v0 = exact_topk_minspass(jnp.asarray(q), jnp.asarray(db),
                                         **kw)
        d1, i1, v1 = exact_topk_minspass(jnp.asarray(q), jnp.asarray(db),
                                         db_bits=bits, **kw)
        assert bool(v0) == bool(v1)
        np.testing.assert_array_equal(np.asarray(d0), np.asarray(d1))
        np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))

    # packed gallery + pad rows + n_valid: pad codes bit-pack to 0x0 and
    # MUST be masked by n_valid before any distance is consumed
    n_real = 1997
    db = _signs(rng, n_real, nbit).astype(np.int8)
    packed, n_pad = pack_serving_gallery(jnp.asarray(db))
    bits = pack_bits_serving(packed, nbit)
    # canonical serving form: one subblock of codes per row (512B rows at
    # nbit=64/S=64); the minspass call below chunks at subblock=8 and
    # re-chunks this 64-aligned pack — both forms must agree
    L = nbit // 32
    assert bits.shape == (-(-n_pad // 64), 64 * L)
    d0, i0, v0 = exact_topk_minspass(jnp.asarray(q), packed, k=k,
                                     subblock=8, cap=32, interpret=True,
                                     n_valid=n_real)
    d1, i1, v1 = exact_topk_minspass(jnp.asarray(q), packed, k=k,
                                     subblock=8, cap=32, interpret=True,
                                     n_valid=n_real, db_bits=bits)
    assert bool(v0) == bool(v1)
    np.testing.assert_array_equal(np.asarray(d0), np.asarray(d1))
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    assert np.asarray(i1).max() < n_real


def test_minspass_retry_recovers_certificate():
    """Deterministic construction where the first candidate budget fails the
    certificate and the on-device 2x retry passes: 30 subblocks each hold
    one entry at distance 1..30 (rest at 40); cap=16 gathers only
    distances 1..16 (+ fillers at 40), so the k=20-th value (40) is not
    below theta_next (17) -> fail; retry at cap=32 covers all 30 ->
    theta_next = 40 > 20 -> valid, exact top-20 = 1..20."""
    nbit, S, k = 64, 8, 20
    q = np.ones((1, nbit), np.float32)
    db = np.full((40 * S, nbit), 1.0, np.float32)

    def at_dist(d):
        row = np.ones(nbit, np.float32)
        row[:d] = -1.0
        return row

    for sb in range(40):
        for j in range(S):
            db[sb * S + j] = at_dist(40)
        if sb < 30:
            db[sb * S] = at_dist(sb + 1)
    dbj = jnp.asarray(db.astype(np.int8))

    d1, i1, v1 = exact_topk_minspass(jnp.asarray(q), dbj, k=k, subblock=S,
                                     cap=16, retry_mult=1, interpret=True)
    assert not bool(v1), "first budget must fail on this construction"

    d2, i2, v2 = exact_topk_minspass(jnp.asarray(q), dbj, k=k, subblock=S,
                                     cap=16, retry_mult=2, interpret=True)
    assert bool(v2), "2x retry must recover the certificate"
    np.testing.assert_array_equal(np.asarray(d2)[0],
                                  np.arange(1, k + 1, dtype=np.float32))

    # bits path takes the same retry route
    from concepthash_tpu.ops.topk_select import pack_bits_serving

    bits = pack_bits_serving(dbj, nbit)
    d3, i3, v3 = exact_topk_minspass(jnp.asarray(q), dbj, k=k, subblock=S,
                                     cap=16, retry_mult=2, interpret=True,
                                     db_bits=bits)
    assert bool(v3)
    np.testing.assert_array_equal(np.asarray(d3), np.asarray(d2))
    np.testing.assert_array_equal(np.asarray(i3), np.asarray(i2))


def test_pack_bits_serving_chunked_matches_direct(rng, monkeypatch):
    """The chunked lax.map build (serving-scale path, forced via
    _PACK_CHUNK_CODES) produces the same subblock-chunk words as the
    single-shot build, for both plain and 128-lane packed inputs, including
    a ragged tail chunk. Guards the round-4 memory rework: chunk outputs
    must already be in the >=128-lane serving layout (a stacked
    (chunks, chunk, L) map output tiles its L-wide minor axis to 128 lanes
    — 64x the data, a 49GB allocation at 1e8)."""
    import concepthash_tpu.ops.topk_select as ts

    nbit = 64
    for N in (1024, 1000):                      # aligned + ragged tail
        db = _signs(rng, N, nbit).astype(np.int8)
        direct = np.asarray(ts.pack_bits_serving(jnp.asarray(db), nbit))
        monkeypatch.setattr(ts, "_PACK_CHUNK_CODES", 256)
        chunked = np.asarray(ts.pack_bits_serving(jnp.asarray(db), nbit))
        monkeypatch.setattr(ts, "_PACK_CHUNK_CODES", 1 << 22)
        np.testing.assert_array_equal(direct, chunked)

        packed, n_pad = ts.pack_serving_gallery(jnp.asarray(db))
        direct_p = np.asarray(ts.pack_bits_serving(packed, nbit))
        monkeypatch.setattr(ts, "_PACK_CHUNK_CODES", 256)
        chunked_p = np.asarray(ts.pack_bits_serving(packed, nbit))
        monkeypatch.setattr(ts, "_PACK_CHUNK_CODES", 1 << 22)
        np.testing.assert_array_equal(direct_p, chunked_p)
        # plain and packed inputs agree on the real rows (pads are 0x0)
        L = nbit // 32
        np.testing.assert_array_equal(
            direct.reshape(-1, L)[:N], direct_p.reshape(-1, L)[:N])


def test_bf16_mins_exact_and_tail_mask(rng):
    """bf16 mins output is bit-exact vs f32 for nbit <= 128 (all
    half-integer distances < 256 sit inside bf16's mantissa), including
    block-ragged N where only the LAST grid step runs the tail mask
    (the round-4 pl.when hoist). Covers plain and packed kernels in
    interpret mode."""
    from concepthash_tpu.ops.topk_select import (pack_serving_gallery,
                                                 subblock_min_dists_packed)

    nbit, S, Q = 64, 8, 16
    for N in (512, 389):                 # block-multiple and block-ragged
        q = _signs(rng, Q, nbit)
        db = _signs(rng, N, nbit).astype(np.int8)
        f32 = np.asarray(subblock_min_dists(
            jnp.asarray(q), jnp.asarray(db), subblock=S, block_rows=64,
            interpret=True))
        bf = np.asarray(subblock_min_dists(
            jnp.asarray(q), jnp.asarray(db), subblock=S, block_rows=64,
            interpret=True, out_dtype=jnp.bfloat16))
        assert bf.dtype == jnp.bfloat16
        np.testing.assert_array_equal(f32, bf.astype(np.float32))

        dbp, npad = pack_serving_gallery(jnp.asarray(db))
        f32p = np.asarray(subblock_min_dists_packed(
            jnp.asarray(q), dbp, subblock=S, interpret=True))
        bfp = np.asarray(subblock_min_dists_packed(
            jnp.asarray(q), dbp, subblock=S, interpret=True,
            out_dtype=jnp.bfloat16))
        assert bfp.dtype == jnp.bfloat16
        np.testing.assert_array_equal(f32p, bfp.astype(np.float32))


def test_zero_component_queries_consistent(rng):
    """Exact-0 query components follow the pack_bits 0-as-negative
    convention EVERYWHERE inside exact_topk_minspass (kernel sims, sign
    rescore, bit-packed rescore, theta) — a jnp.sign qi left 0s that made
    the popcount rescore disagree with the mins by ±0.5/zero-bit and let
    the certificate validate a wrong ranking (round-4 review finding)."""
    from concepthash_tpu.ops.topk_select import exact_topk_minspass

    db = _signs(rng, 512, 64).astype(np.int8)
    q = rng.choice([-1.0, 0.0, 1.0], size=(16, 64)).astype(np.float32)
    qm = np.where(q > 0, 1.0, -1.0)
    dist = 0.5 * (64 - qm @ db.T.astype(np.float32))
    oid = np.argsort(dist, 1, kind="stable")[:, :5]
    od = np.take_along_axis(dist, oid, 1)
    d, i, v = exact_topk_minspass(jnp.asarray(q), jnp.asarray(db), 5,
                                  interpret=True)
    np.testing.assert_array_equal(np.asarray(d), od)
    np.testing.assert_array_equal(np.asarray(i), oid)


def test_pack_bits_serving_rejects_unsupported_widths():
    from concepthash_tpu.ops.topk_select import pack_bits_serving

    with pytest.raises(ValueError, match="32-multiple"):
        pack_bits_serving(jnp.ones((8, 16), jnp.int8), 16)
    with pytest.raises(ValueError, match="ambiguous"):
        pack_bits_serving(jnp.ones((8, 128), jnp.int8))  # no explicit nbit


def test_bitplane_pack_roundtrip(rng):
    """pack_bitplane_serving packs 8 packed rows per byte row along the
    sublane axis; unpack_bitplane inverts it exactly, including both pad
    kinds (P-row zero codes, byte-pad all-negative rows)."""
    from concepthash_tpu.ops.topk_select import (pack_bitplane_serving,
                                                 pack_serving_gallery,
                                                 unpack_bitplane)

    nbit = 32                            # P = 4
    N = 203                              # pack pads to 204; rows 51 -> 56
    db = _signs(rng, N, nbit)
    bp, n_pad = pack_bitplane_serving(db)
    assert bp.dtype == jnp.uint8 and bp.shape == (7, 128)
    assert n_pad == 7 * 8 * 4
    back = np.asarray(unpack_bitplane(bp)).reshape(-1, nbit)
    np.testing.assert_array_equal(back[:N], np.sign(db).astype(np.int8))
    # pack-pad zero codes unpack as all-negative under the >0 convention
    assert (back[N:] == -1).all()
    # packing from the 128-lane int8 form gives the identical array
    packed, _ = pack_serving_gallery(db)
    bp2, n_pad2 = pack_bitplane_serving(packed, nbit=nbit)
    assert n_pad2 == n_pad
    np.testing.assert_array_equal(np.asarray(bp), np.asarray(bp2))


def test_bitplane_mins_matches_oracle(rng):
    """Bit-plane mins kernel (interpret) == the plain-layout reference on
    the same logical gallery, including byte-pad masking (all-zero BITS
    unpack to real-looking all-negative codes and must come out at
    nbit+1, not their raw distance)."""
    from concepthash_tpu.ops.topk_select import (pack_bitplane_serving,
                                                 subblock_min_dists_bitplane)

    nbit, Q = 32, 16                     # P = 4 -> subblock % 32 == 0
    S = 32
    for N in (1024, 1001, 517):          # aligned, pack-ragged, byte-ragged
        q = _signs(rng, Q, nbit)
        db = _signs(rng, N, nbit)
        bp, n_pad = pack_bitplane_serving(db)
        # a bit-plane has no zero state: P-pad SLOTS store as all-negative
        # codes (NOT the int8 layout's nbit/2 zero codes — why serving
        # passes n_valid); byte-pad ROWS are masked to nbit+1 via n_rows
        from concepthash_tpu.ops.topk_select import pack_serving_gallery
        _, n_packpad = pack_serving_gallery(db)
        P = 128 // nbit
        dbp = np.concatenate(
            [db, -np.ones((n_packpad - N, nbit), np.float32)])
        dist = 0.5 * (nbit - q @ np.sign(dbp).T)
        m_real = -(-n_pad // S)
        pad = m_real * S - n_packpad
        if pad:
            dist = np.concatenate(
                [dist, np.full((Q, pad), nbit + 1.0, np.float32)], axis=1)
        mins_np = dist.reshape(Q, m_real, S).min(-1)
        for unpack in ("i32_shift", "i8_mask",
                       "i8_stack"):  # all plane-extraction forms
            got = np.asarray(subblock_min_dists_bitplane(
                jnp.asarray(q), bp, subblock=S, block_g=16, interpret=True,
                n_rows=n_packpad // P, unpack=unpack))
            np.testing.assert_array_equal(got[:m_real].T, mins_np)


def test_exact_bitplane_matches_dense(rng):
    """exact_topk_bitplane == the dense oracle across tie regimes and both
    branches (dense small-m and selection+rescore), with n_valid masking
    both pad kinds."""
    from concepthash_tpu.ops.topk_select import (exact_topk_bitplane,
                                                 pack_bitplane_serving)
    import concepthash_tpu.ops.topk_select as ts

    nbit, k, Q = 64, 9, 5                # P = 2 -> subblock % 16 == 0
    for trial in range(4):
        N = int(rng.integers(900, 4000))
        if trial % 2:                    # duplicate-row tie floods
            base = _signs(rng, max(4, N // 8), nbit)
            db = base[rng.integers(0, base.shape[0], N)]
        else:
            db = _signs(rng, N, nbit)
        q = _signs(rng, Q, nbit)
        bp, n_pad = pack_bitplane_serving(db)
        dist = _oracle_dist(q, db)
        ref = np.sort(dist, 1)[:, :k]

        d, i, v = exact_topk_bitplane(jnp.asarray(q), bp, k, subblock=16,
                                      cap=32, interpret=True, n_valid=N)
        if bool(v):
            np.testing.assert_array_equal(np.sort(np.asarray(d), 1), ref,
                                          err_msg=f"trial {trial}")
        assert np.asarray(i).max() < N
        np.testing.assert_array_equal(
            np.take_along_axis(dist, np.asarray(i), 1), np.asarray(d))

        # force the large-m hierarchical branch on the same data
        old = ts._INNER_DIRECT_MAX
        ts._INNER_DIRECT_MAX = 8
        try:
            d2, i2, v2 = exact_topk_bitplane(jnp.asarray(q), bp, k,
                                             subblock=16, cap=32,
                                             interpret=True, n_valid=N)
        finally:
            ts._INNER_DIRECT_MAX = old
        if bool(v2):
            np.testing.assert_array_equal(np.sort(np.asarray(d2), 1), ref,
                                          err_msg=f"large-m trial {trial}")
        np.testing.assert_array_equal(
            np.take_along_axis(dist, np.asarray(i2), 1), np.asarray(d2))


def test_bitplane_rescore_order_permutation(rng):
    """The rescore's (g_local, j, p) emission order must equal the natural
    in-subblock code order — checked by driving a gallery whose codes are
    all distinct distances from a single query (no ties), so any index
    permutation error surfaces as a wrong index, not a tie swap."""
    from concepthash_tpu.ops.topk_select import (exact_topk_bitplane,
                                                 pack_bitplane_serving)

    nbit, Q = 64, 1
    N = 512                              # exactly 2 subblocks of 256
    # distinct distances: code i flips exactly i (mod nbit+1 capped) bits
    q = np.ones((Q, nbit), np.float32)
    db = np.ones((N, nbit), np.float32)
    for i in range(N):
        db[i, : min(i % 65, nbit)] = -1.0
    bp, n_pad = pack_bitplane_serving(db)
    dist = _oracle_dist(q, db)
    k = 16
    d, i, v = exact_topk_bitplane(jnp.asarray(q), bp, k, subblock=256,
                                  cap=1, interpret=True, n_valid=N)
    np.testing.assert_array_equal(
        np.take_along_axis(dist, np.asarray(i), 1), np.asarray(d))
