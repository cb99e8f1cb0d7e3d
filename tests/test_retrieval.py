"""Retrieval metric parity vs a NumPy oracle implementing the reference
formulas (SURVEY.md §2.6): Hamming on signed codes, stable ascending ranking,
AP@R with zero-relevant queries excluded."""

import numpy as np
import pytest

from concepthash_tpu.ops import hamming as H
from concepthash_tpu.ops.retrieval import (
    calculate_mAP,
    calculate_pr_curve,
    compute_distances,
    get_sim,
    log_trick,
)


# ---------------------------------------------------------------------------
# NumPy oracle (reference semantics, stable tie-break by db index)
# ---------------------------------------------------------------------------

def oracle_hamming(q, db, threshold=0.0):
    def tsign(x):
        return (x > threshold).astype(np.float64) - (x < -threshold).astype(np.float64)

    sq, sdb = tsign(q), tsign(db)
    nbit = q.shape[1]
    return 0.5 * (nbit - sq @ sdb.T)


def oracle_metrics(db_codes, db_labels, q_codes, q_labels, R, ks,
                   threshold=0.0, drop_first=False):
    dist = oracle_hamming(q_codes, db_codes, threshold)
    order = np.argsort(dist, axis=1, kind="stable")
    rel = (q_labels @ db_labels.T) > 0
    APs, P, Rec = [], {k: [] for k in ks}, {k: [] for k in ks}
    N = db_codes.shape[0]
    for i in range(q_codes.shape[0]):
        rel_sorted = rel[i, order[i]]
        if drop_first:
            rel_sorted = rel_sorted[1:]
        n = rel_sorted.shape[0]
        r = n if R == -1 or R > n else R
        imatch = rel_sorted[:r]
        cum = np.cumsum(imatch)
        Px = cum / np.arange(1, r + 1)
        nrel = imatch.sum()
        if nrel > 0:
            APs.append((Px * imatch).sum() / nrel)
        total_rel = rel_sorted.sum()
        for k in ks:
            kk = min(k, n)
            topk = rel_sorted[:kk].sum()
            P[k].append(topk / kk)
            if total_rel > 0:
                Rec[k].append(topk / total_rel)
    mAP = float(np.mean(APs)) if APs else 0.0
    precisions = [float(np.mean(P[k])) for k in ks]
    recalls = [float(np.mean(Rec[k])) if Rec[k] else 0.0 for k in ks]
    return mAP, recalls, precisions


def make_data(rng, nq=23, ndb=67, nbit=16, nclass=5):
    q = rng.standard_normal((nq, nbit)).astype(np.float32)
    db = rng.standard_normal((ndb, nbit)).astype(np.float32)
    ql = np.eye(nclass, dtype=np.float32)[rng.integers(0, nclass, nq)]
    dbl = np.eye(nclass, dtype=np.float32)[rng.integers(0, nclass, ndb)]
    return q, db, ql, dbl


def test_pack_bits_roundtrip(rng):
    codes = rng.standard_normal((13, 40)).astype(np.float32)
    packed = np.asarray(H.pack_bits(codes))
    assert packed.shape == (13, 2)
    ref = H.pack_bits_np(codes)
    np.testing.assert_array_equal(packed, ref)


def test_hamming_packed_matches_sign_dot(rng):
    q, db, _, _ = make_data(rng, nbit=64)
    d_pack = np.asarray(H.hamming_packed(H.pack_bits(q), H.pack_bits(db)))
    d_sign = np.asarray(H.hamming_signs(q, db))
    np.testing.assert_allclose(d_pack, d_sign, atol=1e-5)
    d_oracle = oracle_hamming(q, db)
    np.testing.assert_allclose(d_pack, d_oracle, atol=1e-5)


@pytest.mark.parametrize("R", [-1, 10])
def test_map_matches_oracle(rng, R):
    q, db, ql, dbl = make_data(rng)
    mAP, recalls, precisions = calculate_mAP(db, dbl, q, ql, R=R, PRs=(1, 5, 10))
    o_mAP, o_rec, o_prec = oracle_metrics(db, dbl, q, ql, R, [1, 5, 10])
    assert mAP == pytest.approx(o_mAP, abs=1e-5)
    np.testing.assert_allclose(recalls, o_rec, atol=1e-5)
    np.testing.assert_allclose(precisions, o_prec, atol=1e-5)


def test_map_chunked_equals_unchunked(rng):
    q, db, ql, dbl = make_data(rng, nq=37)
    a = calculate_mAP(db, dbl, q, ql, R=-1, chunk_size=37)
    b = calculate_mAP(db, dbl, q, ql, R=-1, chunk_size=8)
    assert a[0] == pytest.approx(b[0], abs=1e-6)
    np.testing.assert_allclose(a[1], b[1], atol=1e-6)
    np.testing.assert_allclose(a[2], b[2], atol=1e-6)


def test_map_list_of_R(rng):
    q, db, ql, dbl = make_data(rng)
    mAPs, _, _ = calculate_mAP(db, dbl, q, ql, R=[5, 20, -1])
    assert isinstance(mAPs, list) and len(mAPs) == 3
    for R, m in zip([5, 20, -1], mAPs):
        o, _, _ = oracle_metrics(db, dbl, q, ql, R, [1])
        assert m == pytest.approx(o, abs=1e-5)


def test_self_retrieval_drop_first(rng):
    q, _, ql, _ = make_data(rng, nq=15)
    mAP, _, _ = calculate_mAP(q, ql, q, ql, R=-1, remove_first_retrieved=True)
    o, _, _ = oracle_metrics(q, ql, q, ql, -1, [1], drop_first=True)
    assert mAP == pytest.approx(o, abs=1e-5)


def test_ternary_threshold(rng):
    q, db, ql, dbl = make_data(rng)
    mAP, _, _ = calculate_mAP(db, dbl, q, ql, R=-1, threshold=0.5)
    o, _, _ = oracle_metrics(db, dbl, q, ql, -1, [1], threshold=0.5)
    assert mAP == pytest.approx(o, abs=1e-5)


def test_perfect_and_random_extremes(rng):
    # identical codes per class -> perfect retrieval
    nclass, nbit = 4, 16
    protos = np.sign(rng.standard_normal((nclass, nbit))).astype(np.float32)
    labels = rng.integers(0, nclass, 40)
    codes = protos[labels]
    onehot = np.eye(nclass, dtype=np.float32)[labels]
    mAP, _, precisions = calculate_mAP(codes, onehot, codes, onehot, R=-1, PRs=(1,))
    assert mAP == pytest.approx(1.0, abs=1e-6)
    assert precisions[0] == pytest.approx(1.0, abs=1e-6)


def test_zero_mean_eval(rng):
    q, db, ql, dbl = make_data(rng)
    mAP, _, _ = calculate_mAP(db, dbl, q, ql, R=-1, zero_mean=True)
    mean = db.mean(0, keepdims=True)
    o, _, _ = oracle_metrics(db - mean, dbl, q - mean, ql, -1, [1])
    assert mAP == pytest.approx(o, abs=1e-5)


def test_pr_curve_shapes(rng):
    q, db, ql, dbl = make_data(rng)
    recalls, precisions, Rs = calculate_pr_curve(db, dbl, q, ql, num_points=10)
    assert len(recalls) == len(precisions) == len(Rs)
    assert Rs[0] == 1 and Rs[-1] == db.shape[0]
    # recall is monotonically nondecreasing in R
    assert all(b >= a - 1e-9 for a, b in zip(recalls, recalls[1:]))


def test_cosine_and_euclidean_metrics(rng):
    q, db, ql, dbl = make_data(rng)
    d_cos = np.asarray(compute_distances(q, db, "cosine"))
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    dn = db / np.linalg.norm(db, axis=1, keepdims=True)
    np.testing.assert_allclose(d_cos, 1 - qn @ dn.T, atol=1e-5)
    d_euc = np.asarray(compute_distances(q, db, "euclidean"))
    ref = ((q[:, None, :] - db[None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(d_euc, ref, rtol=1e-4, atol=1e-3)


def test_get_sim_and_log_trick(rng):
    y1 = np.eye(3, dtype=np.float32)[[0, 1, 2, 0]]
    y2 = np.eye(3, dtype=np.float32)[[0, 0, 2]]
    s = np.asarray(get_sim(y1, y2))
    expected = np.array([[1, 1, 0], [0, 0, 0], [0, 0, 1], [1, 1, 0]], bool)
    np.testing.assert_array_equal(s, expected)
    x = np.array([-100.0, -1.0, 0.0, 1.0, 100.0], np.float32)
    np.testing.assert_allclose(np.asarray(log_trick(x)),
                               np.log1p(np.exp(np.minimum(x, 30))) + np.maximum(x - 30, 0),
                               rtol=1e-5, atol=1e-6)


def test_retrieve_topk_matches_bruteforce(rng):
    from concepthash_tpu.ops.hamming import pack_bits
    from concepthash_tpu.ops.retrieval import retrieve_topk
    import jax.numpy as jnp

    q = rng.standard_normal((8, 32)).astype(np.float32)
    db_codes = rng.standard_normal((200, 32)).astype(np.float32)
    d_ref = oracle_hamming(q, db_codes)

    # exact path: distance values must match brute force exactly
    d_mxu, idx_mxu = retrieve_topk(q, np.sign(db_codes).astype(np.float32),
                                   k=10, method="mxu", exact=True)
    d_sorted = np.sort(d_ref, axis=1)[:, :10]
    np.testing.assert_allclose(np.asarray(d_mxu), d_sorted, atol=1e-4)

    d_pop, idx_pop = retrieve_topk(q, pack_bits(db_codes), k=10,
                                   method="popcount", exact=True)
    np.testing.assert_allclose(np.asarray(d_pop), d_sorted, atol=1e-4)

    # approximate path: high recall against the exact top-k set
    d_apx, idx_apx = retrieve_topk(q, np.sign(db_codes).astype(np.float32),
                                   k=10, method="mxu")
    hits = 0
    exact_sets = [set(np.argsort(d_ref[i], kind="stable")[:10]) for i in range(8)]
    # compare by distance value (ties make index sets ambiguous)
    for i in range(8):
        hits += sum(1 for d in np.asarray(d_apx)[i] if d <= d_sorted[i, -1] + 1e-4)
    assert hits >= 0.9 * 8 * 10


def test_exact_topk_blocked_equals_full_sort(rng):
    """exact_topk_blocked (subblock-min hierarchy + validity-gated fallback)
    returns identical distances to a full sort on BOTH regimes: tie-heavy
    integer data (validity fails -> on-device lax.top_k fallback) and
    spread-out continuous data (hierarchical fast path); indices map back
    to the returned distances. Padding (N not a multiple of subblock) and
    the small-N direct path are covered."""
    import jax.numpy as jnp
    from concepthash_tpu.ops.retrieval import exact_topk_blocked

    for N in (1000, 1024, 1030):          # non-multiple, multiple, off-by-6
        # integer-valued distances -> massive ties -> fallback branch
        dist = rng.integers(0, 17, size=(5, N)).astype(np.float32)
        d_blk, i_blk = exact_topk_blocked(jnp.asarray(dist), k=13,
                                          subblock=16, cap=8)
        d_full = np.sort(dist, axis=1)[:, :13]
        np.testing.assert_array_equal(np.asarray(d_blk), d_full)
        idx = np.asarray(i_blk)
        assert idx.min() >= 0 and idx.max() < N
        np.testing.assert_array_equal(
            np.take_along_axis(dist, idx, axis=1), np.asarray(d_blk))

    # continuous distances (no ties): hierarchical fast path, still exact
    dist = rng.standard_normal((6, 4096)).astype(np.float32)
    d_blk, i_blk = exact_topk_blocked(jnp.asarray(dist), k=13,
                                      subblock=16, cap=64)
    np.testing.assert_array_equal(np.asarray(d_blk),
                                  np.sort(dist, axis=1)[:, :13])
    np.testing.assert_array_equal(
        np.take_along_axis(dist, np.asarray(i_blk), axis=1),
        np.asarray(d_blk))

    # adversarial-for-the-hierarchy: all top-k inside one subblock
    dist = rng.uniform(10.0, 20.0, size=(4, 4096)).astype(np.float32)
    dist[:, 100:113] = np.linspace(0.0, 1.0, 13, dtype=np.float32)
    d_blk, i_blk = exact_topk_blocked(jnp.asarray(dist), k=13,
                                      subblock=16, cap=64)
    np.testing.assert_array_equal(np.asarray(d_blk),
                                  np.sort(dist, axis=1)[:, :13])

    # small-N direct path
    dist = rng.standard_normal((3, 50)).astype(np.float32)
    d_blk, _ = exact_topk_blocked(jnp.asarray(dist), k=7)
    np.testing.assert_allclose(np.asarray(d_blk),
                               np.sort(dist, axis=1)[:, :7], atol=0)


def test_explicit_relevance_matrix(rng):
    """GLDv2-style landmark ground truth: relevance given explicitly instead
    of by label matching."""
    q, db, ql, dbl = make_data(rng)
    label_rel = ((ql @ dbl.T) > 0)
    a = calculate_mAP(db, dbl, q, ql, R=-1, PRs=(1, 5))
    b = calculate_mAP(db, dbl, q, ql, R=-1, PRs=(1, 5),
                      rel_matrix=label_rel)
    assert b[0] == pytest.approx(a[0], abs=1e-6)
    # a different relevance definition changes the score
    c = calculate_mAP(db, dbl, q, ql, R=-1, PRs=(1,),
                      rel_matrix=~label_rel)
    assert c[0] != pytest.approx(a[0], abs=1e-3)


def test_streaming_topk_matches_exact(rng):
    """retrieve_topk_streaming (int8 MXU blocks + running merge) finds the
    same top-k distances as a full exact top-k; returned indices map back to
    the returned distances."""
    import jax.numpy as jnp

    from concepthash_tpu.ops.retrieval import (retrieve_topk,
                                               retrieve_topk_streaming)

    nbit, n_db, k = 32, 4096, 10
    db = np.sign(rng.standard_normal((n_db, nbit))).astype(np.float32)
    db[db == 0] = 1.0
    q = np.sign(rng.standard_normal((7, nbit))).astype(np.float32)

    d_ex, _ = retrieve_topk(jnp.asarray(q), jnp.asarray(db), k=k, exact=True)
    d_st, i_st = retrieve_topk_streaming(jnp.asarray(q),
                                         jnp.asarray(db, jnp.int8),
                                         k=k, db_block=1024)
    d_ex, d_st, i_st = map(np.asarray, (d_ex, d_st, i_st))
    # same multiset of top-k distances per query (order within ties free)
    np.testing.assert_allclose(np.sort(d_st, axis=1), np.sort(d_ex, axis=1))
    # each returned index really has the returned distance
    ham = 0.5 * (nbit - (q[:, None, :] * db[i_st]).sum(-1))
    np.testing.assert_allclose(ham, d_st)

    # exact=True: per-block hierarchical exact selection -> the whole
    # streaming result is the exact distance multiset, bit-for-bit
    d_sx, i_sx = retrieve_topk_streaming(jnp.asarray(q),
                                         jnp.asarray(db, jnp.int8),
                                         k=k, db_block=1024, exact=True)
    d_sx, i_sx = map(np.asarray, (d_sx, i_sx))
    np.testing.assert_array_equal(np.sort(d_sx, axis=1), np.sort(d_ex, axis=1))
    ham = 0.5 * (nbit - (q[:, None, :] * db[i_sx]).sum(-1))
    np.testing.assert_allclose(ham, d_sx)


def test_topk_n_valid_masks_pad_rows(rng):
    """Gallery pad rows (all-zero codes, distance nbit/2 — NOT inf-like)
    must never surface in top-k when n_valid is given: every real row is
    placed FARTHER than nbit/2 so an unmasked selection would return pad
    indices (ADVICE r3)."""
    import jax.numpy as jnp

    from concepthash_tpu.ops.retrieval import (retrieve_topk,
                                               retrieve_topk_streaming)

    nbit, n_real, n_pad, k = 32, 600, 424, 10
    q = np.ones((5, nbit), np.float32)
    db = np.concatenate([np.full((n_real, nbit), -1.0, np.float32),
                         np.zeros((n_pad, nbit), np.float32)])  # pads closer!

    for exact in (False, True):
        d, idx = retrieve_topk(jnp.asarray(q), jnp.asarray(db), k=k,
                               exact=exact, n_valid=n_real)
        idx = np.asarray(idx)
        assert idx.max() < n_real, f"pad index surfaced (exact={exact})"
        np.testing.assert_allclose(np.asarray(d), float(nbit))

        d_st, i_st = retrieve_topk_streaming(jnp.asarray(q),
                                             jnp.asarray(db, jnp.int8),
                                             k=k, db_block=256, exact=exact,
                                             n_valid=n_real)
        assert np.asarray(i_st).max() < n_real
        np.testing.assert_allclose(np.asarray(d_st), float(nbit))

    # unmasked control: the pad rows DO win — the mask is load-bearing
    _, idx_ctl = retrieve_topk(jnp.asarray(q), jnp.asarray(db), k=k)
    assert np.asarray(idx_ctl).min() >= n_real


def test_exact_query_tail_padding(rng):
    """Q > the 1024-query tile with a ragged tail: the tail tile is padded
    by repeating a real query (not zeros) and the sliced result is still the
    exact top-k for every real query."""
    import jax.numpy as jnp

    from concepthash_tpu.ops.retrieval import retrieve_topk

    nbit, n_db, Q, k = 16, 512, 1030, 7
    db = np.sign(rng.standard_normal((n_db, nbit))).astype(np.float32)
    db[db == 0] = 1.0
    q = np.sign(rng.standard_normal((Q, nbit))).astype(np.float32)
    q[q == 0] = 1.0

    d, idx = retrieve_topk(jnp.asarray(q), jnp.asarray(db), k=k, exact=True)
    d, idx = np.asarray(d), np.asarray(idx)
    assert d.shape == (Q, k)
    full = 0.5 * (nbit - np.sign(q) @ db.T)
    np.testing.assert_allclose(d, np.sort(full, axis=1)[:, :k])
    np.testing.assert_allclose(np.take_along_axis(full, idx, axis=1), d)


def test_nmi_matches_sklearn(rng):
    """normalized_mutual_info vs sklearn's normalized_mutual_info_score
    (arithmetic-mean normalization, the reference's pseudo-label metric —
    train_helper.py:243-251)."""
    from sklearn.metrics import normalized_mutual_info_score

    from concepthash_tpu.ops.retrieval import normalized_mutual_info

    for trial in range(5):
        n = int(rng.integers(20, 200))
        a = rng.integers(0, int(rng.integers(2, 8)), n)
        b = rng.integers(0, int(rng.integers(2, 8)), n)
        np.testing.assert_allclose(normalized_mutual_info(a, b),
                                   normalized_mutual_info_score(a, b),
                                   atol=1e-10)
    # identical partitions -> 1; independent-ish relabeling invariance
    a = rng.integers(0, 5, 100)
    np.testing.assert_allclose(normalized_mutual_info(a, a), 1.0, atol=1e-12)
    np.testing.assert_allclose(normalized_mutual_info(a, 4 - a), 1.0,
                               atol=1e-12)
    # degenerate single-cluster cases follow sklearn's conventions
    z = np.zeros(50, int)
    assert normalized_mutual_info(z, z) == normalized_mutual_info_score(z, z)
    assert normalized_mutual_info(z, a[:50]) == \
        normalized_mutual_info_score(z, a[:50])
