"""Retrieval scoring: mAP@R, P@k, R@k, PR curves — on device, chunked, static
shapes.

Implements the semantics of the reference's missing ``utils.hashing``
(reconstructed from call sites in SURVEY.md §2.6; exercised at reference
experiments/train_helper.py:228-234 and experiments/test_hashing.py:106-168):

  - distances: Hamming over signed codes (popcount on packed bits), or
    cosine / euclidean on raw codes (``dist_metric``), with optional ternary
    threshold (reference configs/val.yaml:12).
  - ranking: ascending distance; ties broken by database index
    (deterministic stable sort — the reference's np.argsort default is
    non-stable, so tie order there is arbitrary; we pin it, SURVEY.md §7
    hard-part 3).
  - AP@R per query: sum(P@i * rel_i, i<=R) / (#relevant in top R); queries
    with no relevant item in top R are *excluded* from the mean (matches the
    reference's ``if rel != 0: APx.append(...)`` convention).
  - P@k = mean_q(#rel in top k)/k ; R@k = mean_q(#rel in top k / #rel in db),
    queries with no relevant db item excluded from R@k.
  - R == -1 means "whole database"; R may be a list -> list of mAPs.
  - ``remove_first_retrieved`` drops rank-0 (self-retrieval when the test set
    is its own database, reference test_hashing.py:105-112).

TPU-native notes: query chunks are jitted with static (chunk, N) shapes; the
database side may be sharded over the mesh's 'data' axis — distances are then
computed shard-local and XLA inserts the all-gather before the sort.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from concepthash_tpu.ops import hamming as H


# ---------------------------------------------------------------------------
# distances
# ---------------------------------------------------------------------------

def compute_distances(query_codes, db_codes, dist_metric: str = "hamming",
                      threshold: float = 0.0):
    """(Q, nbit) x (N, nbit) -> (Q, N) distances (smaller = closer)."""
    if dist_metric == "hamming":
        if threshold != 0.0:
            return H.hamming_signs(query_codes, db_codes, threshold)
        q = H.pack_bits(query_codes)
        db = H.pack_bits(db_codes)
        return H.hamming_packed(q, db)
    if dist_metric == "cosine":
        qn = query_codes / (jnp.linalg.norm(query_codes, axis=-1, keepdims=True) + 1e-12)
        dn = db_codes / (jnp.linalg.norm(db_codes, axis=-1, keepdims=True) + 1e-12)
        # HIGHEST precision: ranking exactness matters more than MXU bf16 speed
        return 1.0 - jnp.dot(qn, dn.T, preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)
    if dist_metric == "euclidean":
        q2 = jnp.sum(query_codes ** 2, axis=-1, keepdims=True)
        d2 = jnp.sum(db_codes ** 2, axis=-1, keepdims=True)
        return q2 + d2.T - 2.0 * jnp.dot(query_codes, db_codes.T,
                                         preferred_element_type=jnp.float32,
                                         precision=jax.lax.Precision.HIGHEST)
    raise ValueError(f"unknown dist_metric {dist_metric!r}")


# ---------------------------------------------------------------------------
# chunked ranking metrics
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("dist_metric", "threshold", "Rs",
                                             "ks", "drop_first", "use_rel",
                                             "prep"))
def _chunk_stats(q_codes, q_labels, q_valid, db_codes, db_labels,
                 dist_metric: str, threshold: float,
                 Rs: tuple, ks: tuple, drop_first: bool,
                 rel_chunk=None, use_rel: bool = False, prep: str = "none"):
    """Per-query-chunk metrics. Returns dict of (C,)-shaped arrays.

    Rs: tuple of cutoff ranks for AP; ks: precision/recall cutoffs
    (P@k divides by min(k, n) — the truncated-precision definition the
    NumPy oracle pins). rel_chunk (use_rel=True): explicit (C, N)
    relevance overriding label matching (GLDv2-style landmark ground
    truth, SURVEY.md §2.6). prep: caller pre-applied db transform —
    'hamming_packed' (db_codes is the (N, L) uint32 bit-pack) or
    'cosine_pre' (rows pre-normalized); avoids redoing O(N*nbit) db work
    per query chunk.
    """
    if prep == "hamming_packed":
        dist = H.hamming_packed(H.pack_bits(q_codes), db_codes)
    elif prep == "cosine_pre":
        qn = q_codes / (jnp.linalg.norm(q_codes, axis=-1, keepdims=True)
                        + 1e-12)
        dist = 1.0 - jnp.dot(qn, db_codes.T,
                             preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)
    else:
        dist = compute_distances(q_codes, db_codes, dist_metric, threshold)
    dist = dist.astype(jnp.float32)
    if use_rel:
        rel = rel_chunk.astype(bool)
    else:
        rel = (jnp.dot(q_labels.astype(jnp.float32),
                       db_labels.astype(jnp.float32).T,
                       preferred_element_type=jnp.float32) > 0)

    order = jnp.argsort(dist, axis=1, stable=True)  # ties -> db index
    rel_sorted = jnp.take_along_axis(rel, order, axis=1)
    if drop_first:
        rel_sorted = rel_sorted[:, 1:]
    n = rel_sorted.shape[1]

    ranks1 = jnp.arange(1, n + 1, dtype=jnp.float32)
    cum = jnp.cumsum(rel_sorted.astype(jnp.float32), axis=1)
    prec_at = cum / ranks1  # (C, n)

    out = {}
    for R in Rs:
        r = n if (R == -1 or R > n) else int(R)
        relmask = rel_sorted[:, :r].astype(jnp.float32)
        ap_num = jnp.sum(prec_at[:, :r] * relmask, axis=1)
        rel_count = cum[:, r - 1]
        out[f"ap_sum@{R}"] = jnp.where(rel_count > 0, ap_num / rel_count, 0.0) * q_valid
        out[f"ap_cnt@{R}"] = (rel_count > 0).astype(jnp.float32) * q_valid

    total_rel = jnp.sum(rel.astype(jnp.float32), axis=1)
    if drop_first:
        total_rel = jnp.maximum(total_rel - 1.0, 0.0)
    for k in ks:
        kk = min(int(k), n)
        topk_rel = cum[:, kk - 1]
        out[f"p_sum@{k}"] = (topk_rel / kk) * q_valid
        out[f"r_sum@{k}"] = jnp.where(total_rel > 0, topk_rel / total_rel, 0.0) * q_valid
        out[f"r_cnt@{k}"] = (total_rel > 0).astype(jnp.float32) * q_valid
    out["n_valid"] = q_valid
    return out


def _default_chunk(nq: int, ndb: int) -> int:
    # ~64M distance entries per chunk keeps peak memory modest.
    c = max(1, (1 << 26) // max(ndb, 1))
    return int(min(nq, c))


def calculate_mAP(db_codes, db_labels, query_codes, query_labels, R=-1,
                  dist_metric: str = "hamming", PRs=(1, 5, 10),
                  threshold: float = 0.0, remove_first_retrieved: bool = False,
                  zero_mean: bool = False, chunk_size: int | None = None,
                  multiclass: bool = False, onehot: bool = True,
                  rel_matrix=None, **_ignored):
    """Reference-parity retrieval scoring.

    Returns ``(mAP, recalls, precisions)`` — mAP is a float (or list when R is
    a list); recalls/precisions are lists aligned with ``PRs``.
    ``rel_matrix`` (Q, N) bool: explicit relevance (landmark ground truth)
    instead of label matching.
    """
    db_codes = jnp.asarray(db_codes, dtype=jnp.float32)
    query_codes = jnp.asarray(query_codes, dtype=jnp.float32)

    Rs = tuple(R) if isinstance(R, (list, tuple)) else (R,)
    ks = tuple(int(k) for k in (PRs or ()))
    if query_codes.shape[0] == 0 or db_codes.shape[0] == 0:
        # defined result for an empty split instead of a KeyError
        mAP = [0.0] * len(Rs) if isinstance(R, (list, tuple)) else 0.0
        return mAP, [0.0] * len(ks), [0.0] * len(ks)

    # one-hot with a SHARED class count: inferring per-array from max()
    # crashes on a query split that lacks the top class id
    nclass = _shared_nclass(db_labels, query_labels)
    db_labels = _as_onehot(db_labels, nclass)
    query_labels = _as_onehot(query_labels, nclass)

    if zero_mean:
        mean = db_codes.mean(axis=0, keepdims=True)
        db_codes = db_codes - mean
        query_codes = query_codes - mean

    nq, ndb = query_codes.shape[0], db_codes.shape[0]
    chunk = chunk_size or _default_chunk(nq, ndb)

    # hoist per-chunk-invariant db preprocessing out of _chunk_stats: the
    # bit-pack (hamming) / normalization (cosine) of the FULL database was
    # being recomputed inside every chunk call — O(N*nbit) work repeated
    # nq/chunk times
    prep = "none"
    if dist_metric == "hamming" and threshold == 0.0:
        db_codes = jax.jit(H.pack_bits)(db_codes)
        prep = "hamming_packed"
    elif dist_metric == "cosine":
        db_codes = jax.jit(
            lambda d: d / (jnp.linalg.norm(d, axis=-1, keepdims=True)
                           + 1e-12))(db_codes)
        prep = "cosine_pre"

    acc: dict[str, float] = {}
    for s in range(0, nq, chunk):
        e = min(s + chunk, nq)
        qc = query_codes[s:e]
        ql = query_labels[s:e]
        rc = (jnp.asarray(rel_matrix[s:e], jnp.float32)
              if rel_matrix is not None else None)
        valid = np.ones(e - s, np.float32)
        if e - s < chunk:  # pad to static shape
            pad = chunk - (e - s)
            qc = jnp.pad(qc, ((0, pad), (0, 0)))
            ql = jnp.pad(ql, ((0, pad), (0, 0)))
            if rc is not None:
                rc = jnp.pad(rc, ((0, pad), (0, 0)))
            valid = np.concatenate([valid, np.zeros(pad, np.float32)])
        stats = _chunk_stats(qc, ql, jnp.asarray(valid), db_codes, db_labels,
                             dist_metric, float(threshold), Rs, ks,
                             bool(remove_first_retrieved),
                             rel_chunk=rc, use_rel=rc is not None,
                             prep=prep)
        for k, v in stats.items():
            acc[k] = acc.get(k, 0.0) + float(jnp.sum(v))

    mAPs = []
    for r in Rs:
        cnt = acc.get(f"ap_cnt@{r}", 0.0)
        mAPs.append(acc[f"ap_sum@{r}"] / cnt if cnt > 0 else 0.0)
    n_valid = acc.get("n_valid", float(nq))
    precisions = [acc[f"p_sum@{k}"] / n_valid for k in ks]
    recalls = []
    for k in ks:
        cnt = acc.get(f"r_cnt@{k}", 0.0)
        recalls.append(acc[f"r_sum@{k}"] / cnt if cnt > 0 else 0.0)

    mAP = mAPs if isinstance(R, (list, tuple)) else mAPs[0]
    return mAP, recalls, precisions


def calculate_pr_curve(db_codes, db_labels, query_codes, query_labels,
                       dist_metric: str = "hamming", threshold: float = 0.0,
                       remove_first_retrieved: bool = False,
                       num_points: int = 50, chunk_size: int | None = None,
                       **_ignored):
    """PR curve over log-spaced rank cutoffs. Returns (recalls, precisions, Rs)
    (reference call site: test_hashing.py:153-162)."""
    ndb = db_codes.shape[0] if hasattr(db_codes, "shape") else len(db_codes)
    n = ndb - 1 if remove_first_retrieved else ndb
    Rs = np.unique(np.geomspace(1, n, num_points).astype(int)).tolist()
    _, recalls, precisions = calculate_mAP(
        db_codes, db_labels, query_codes, query_labels, R=-1,
        dist_metric=dist_metric, PRs=tuple(Rs), threshold=threshold,
        remove_first_retrieved=remove_first_retrieved, chunk_size=chunk_size)
    return recalls, precisions, list(Rs)


def _shared_nclass(*label_arrays):
    """Class count consistent across all given label arrays (max class id
    of the 1-d ones, width of the one-hot ones)."""
    n = 0
    for a in label_arrays:
        a = jnp.asarray(a)
        if a.ndim == 1:
            if a.shape[0]:
                n = max(n, int(a.max()) + 1)
        else:
            n = max(n, a.shape[1])
    return n


def _as_onehot(labels, nclass: int | None = None):
    labels = jnp.asarray(labels)
    if labels.ndim == 1:
        if nclass is None:
            nclass = int(labels.max()) + 1
        labels = jax.nn.one_hot(labels, nclass, dtype=jnp.float32)
    elif nclass is not None and labels.shape[1] < nclass:
        # widen a narrower one-hot/multi-hot to the shared class count
        labels = jnp.pad(labels, ((0, 0), (0, nclass - labels.shape[1])))
    return labels.astype(jnp.float32)


# ---------------------------------------------------------------------------
# serving-path top-k retrieval
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("k", "method", "exact"))
def retrieve_topk(query_codes, db, k: int = 100, method: str = "mxu",
                  exact: bool = False, n_valid=None):
    """Top-k nearest database entries by Hamming distance — the serving path.

    Measured on TPU v5e, 1M-entry 64-bit gallery (bench.py): lax.top_k over
    the distance row is sort-bound (~0.4k qps); ``approx_min_k`` is the
    TPU-native partial reduction (~50k qps on the popcount path), and for
    nbit <= ~256 computing distances as a sign matmul puts the work on the
    MXU instead of the VPU (~134k qps). Defaults to the MXU path.

    query_codes: (Q, nbit) float sign-able codes.
    db: method='mxu' -> (N, nbit) ±1 float (use jnp.sign(codes));
        method='popcount' -> (N, L) uint32 packed (ops.hamming.pack_bits).
    exact=True returns the exact distance multiset (vs approx_min_k's
    recall_target 0.95) via the hierarchical selection in
    ``exact_topk_blocked``, query-chunked to bound peak HBM — measured
    15.1k qps at the bench point vs 3.1k for a full ``lax.top_k``
    (scripts/bench_exact_topk.py, v5e, 2026-08-17).
    n_valid: real database row count when ``db`` carries pad rows (e.g. the
    zero-code padding from pack_serving_gallery / shard_gallery, which sits
    at distance nbit/2 — NOT inf-like); rows >= n_valid are masked to +inf
    inside the selection so pad indices never appear in results. May be a
    traced scalar (make_sharded_topk derives it per shard from axis_index).
    Returns (distances (Q, k) float32, indices (Q, k) int32).
    """
    def _mask(dist):
        if n_valid is None:
            return dist
        col = jnp.arange(dist.shape[-1], dtype=jnp.int32)
        return jnp.where(col < n_valid, dist, jnp.inf)

    def _dist(qc):
        if method == "mxu":
            nbit = qc.shape[-1]
            # strict ±1 (0 -> -1): the pack_bits convention calculate_mAP
            # scores with, and what keeps every exit of the exact path
            # (mins kernel, its certificate fallback, popcount rescore)
            # returning identical distances for exact-0 code components
            sq = jnp.where(qc > 0, 1, -1).astype(jnp.bfloat16)
            sdb = jnp.where(db > 0, 1, -1).astype(jnp.bfloat16)
            sim = jax.lax.dot_general(sq, sdb,
                                      (((1,), (1,)), ((), ())),
                                      preferred_element_type=jnp.float32)
            return _mask(0.5 * (nbit - sim))
        if method == "popcount":
            from concepthash_tpu.ops.hamming import hamming_packed

            return _mask(hamming_packed(qc, db).astype(jnp.float32))
        raise ValueError(method)

    if method == "popcount":
        from concepthash_tpu.ops.hamming import pack_bits

        query_codes = pack_bits(query_codes)
    if exact:
        # lax.map over query tiles: bounds peak HBM to one (chunk, N)
        # distance tile + its row-major relayout (the full (Q, N) pair OOMs
        # a 16G chip at Q=2048, N=1M), and scopes the tie-fallback cond to
        # the tile that tripped it
        chunk = 1024
        Q = query_codes.shape[0]
        nbit = query_codes.shape[-1]
        N = db.shape[0]
        # mxu galleries big enough for the hierarchy route through the
        # fused Pallas mins kernel (distance tile never in HBM); its
        # certificate falls back to the XLA hierarchical selection, which
        # has its own full-top_k fallback — exact at every exit. The
        # sign->int8->packed conversion is loop-invariant (hoisted out of
        # the query map); ~0.2ms of traffic at 1M x 64.
        use_kernel = (method == "mxu" and 128 % nbit == 0
                      and nbit % 32 == 0  # bit-pack words are 32-lane
                      and N % (128 // nbit) == 0 and N > 65536
                      and jax.default_backend() == "tpu")
        if use_kernel:
            from concepthash_tpu.ops.topk_select import (exact_topk_minspass,
                                                         pack_bits_serving)

            db_i8 = jnp.where(db > 0, 1, -1).astype(jnp.int8)  # strict ±1
            packed_db = db_i8.reshape(N * nbit // 128, 128)
            # bit-packed rescore copy: one extra gallery read per call for
            # an 8x smaller candidate gather (loop-invariant, hoisted out
            # of the query map like packed_db)
            db_bits = pack_bits_serving(db_i8, nbit)

        def _exact_tile(qc):
            if use_kernel:
                d_f, i_f, ok = exact_topk_minspass(qc, packed_db, k,
                                                   n_valid=n_valid,
                                                   db_bits=db_bits)
                return jax.lax.cond(
                    ok, lambda _: (d_f, i_f),
                    lambda _: exact_topk_blocked(_dist(qc), k), None)
            return exact_topk_blocked(_dist(qc), k)

        if Q <= chunk:
            return _exact_tile(query_codes)
        pad = (-Q) % chunk
        # pad the tail by REPEATING the first real query (results are sliced
        # off): an all-zero pad query has sign(0)=0 codes whose distances all
        # tie at nbit/2, which defeats the exactness certificate and forces
        # the whole tail tile through the full top_k fallback — a silent ~5x
        # tail slowdown whenever Q is not a chunk multiple
        qp = (jnp.concatenate(
            [query_codes,
             jnp.broadcast_to(query_codes[:1],
                              (pad,) + query_codes.shape[1:])]) if pad
            else query_codes)
        d, idx = jax.lax.map(
            _exact_tile, qp.reshape(-1, chunk, *query_codes.shape[1:]))
        return (d.reshape(-1, k)[:Q], idx.reshape(-1, k)[:Q])
    d, idx = jax.lax.approx_min_k(_dist(query_codes), k)
    return d, idx


def exact_topk_blocked(dist, k: int, subblock: int = 64, cap: int = 512):
    """EXACT min-k over the last axis, hierarchically — the TPU-fast path
    around ``lax.top_k``'s TopK custom call (measured ~0.33 ns/element on
    v5e regardless of dtype or k, i.e. 67x off HBM speed-of-light for a
    selection that only needs two passes).

    Three stages, all bandwidth- or small-sort-bound:
      1. per-subblock mins: (Q, N) -> (Q, N/S) pure min-reduce (one read of
         the distance matrix at HBM bandwidth);
      2. select the ``cap`` subblocks with the smallest mins (a top_k over
         N/S elements, ~S times cheaper than over N) and gather their
         contents -> (Q, cap*S);
      3. exact top_k over the gathered candidates (~N/(cap*S) times cheaper
         than the full row).

    Exactness: any entry outside the selected subblocks is >= its subblock
    min >= theta_next (the best UNSELECTED subblock min). If the returned
    k-th distance is strictly below theta_next for every query, no outside
    entry can displace a returned one and the result equals the full
    ``lax.top_k`` distance multiset. That validity condition is checked on
    device; a ``lax.cond`` falls back to the full ``lax.top_k`` when it
    fails (runs only then), so the function is exact for ALL inputs and
    fast whenever the k-th distance clears the unselected subblocks —
    which holds for sign-code Hamming distances (binomial-tailed; the
    tie-heavy adversarial case is integer-uniform data, exercised in
    tests/test_retrieval.py).

    Measured (v5e, 2048 queries x 1M x 64-bit, k=100,
    scripts/bench_exact_topk.py): 15.1k qps vs 3.1k for full lax.top_k
    (5.0x) at S=64/cap=512 in 1024-query chunks. cap=256 drops BELOW
    baseline (2.6k) — candidate subblocks exceed the cap, the validity
    check fails and every chunk pays hierarchy + fallback; keep cap
    comfortably above k + expected distance-ties (~2-4x k).
    """
    Q, N = dist.shape
    if N <= 2 * cap * subblock or k > cap:
        neg, idx = jax.lax.top_k(-dist, k)
        return -neg, idx
    pad = (-N) % subblock
    if pad:
        dist = jnp.concatenate(
            [dist, jnp.full((Q, pad), jnp.inf, dist.dtype)], axis=1)
    m = (N + pad) // subblock
    # One reshape up front: the (Q, m, S) view relayouts the matmul's
    # column-major distances to row-major ONCE (a bandwidth-speed copy);
    # the min-reduce, the subblock slice-gather, the final top_k AND the
    # fallback top_k all read that same buffer. (Element-wise
    # take_along_axis gathers from the 2-d matrix measured ~100 ms/chunk —
    # the (1,1,S) slice gather here is the fast form.)
    d3 = dist.reshape(Q, m, subblock)
    mins = d3.min(axis=-1)                                 # (Q, m)
    neg_mv, mi = jax.lax.top_k(-mins, cap + 1)             # (Q, cap+1)
    sel = mi[:, :cap]
    theta_next = -neg_mv[:, cap]                           # best unselected min
    g = jnp.take_along_axis(d3, sel[:, :, None], axis=1)   # (Q, cap, S)
    negd, li = jax.lax.top_k(-g.reshape(Q, cap * subblock), k)
    d_fast = -negd
    i_fast = (jnp.take_along_axis(sel, li // subblock, axis=1) * subblock
              + li % subblock)
    valid = jnp.all(d_fast[:, -1] < theta_next)

    def _slow(_):
        # inf padding never enters the top-k (k <= #finite entries), so
        # indices from the padded width are valid global indices
        neg, idx = jax.lax.top_k(-d3.reshape(Q, m * subblock), k)
        return -neg, idx

    return jax.lax.cond(valid, lambda _: (d_fast, i_fast), _slow, None)


def retrieve_topk_streaming(query_codes, db_signs, k: int = 100,
                            db_block: int = 2_000_000, exact: bool = False,
                            n_valid=None, db_bits=None):
    """Serving top-k over galleries too large to materialize distances for
    (100M+ entries on one chip).

    The gallery lives in HBM as int8 signs ((N, nbit), 1 byte/bit-dim: 6.4GB
    at N=1e8, nbit=64 — the bf16 form would not fit beside its distance
    workspace). A ``lax.scan`` walks db blocks: each block's distances come
    from one int8×int8 MXU matmul (int8 runs at 2× the bf16 MACs/cycle on
    v5e), per-block selection reduces (Q, block) -> (Q, k), and the
    running result merges via top_k over the concatenated 2k candidates —
    so peak memory is one (Q, db_block) distance tile, never (Q, N).

    Per-block selection is approx_min_k (recall_target 0.95; measured
    distance-level recall@100 0.9994 at 10M — block losses don't compound
    across the merge). ``exact=True`` returns the exact distance multiset:
    the fast path is the fused Pallas mins-pass + candidate rescore
    (ops/topk_select.exact_topk_minspass — the distance matrix never
    touches HBM); its exactness certificate lax.cond-falls back to a
    per-block hierarchical scan (exact_topk_blocked per block + exact
    merge) on tie-pathological data, so the result is exact for ALL
    inputs.

    ``db_signs`` is (N, nbit) int8 signs or the 128-lane packed form from
    ops/topk_select.pack_serving_gallery ((N/P, 128), P = 128//nbit) —
    packed is the zero-copy layout for the Pallas mins kernel and the
    recommended serving format for nbit < 128.

    ``db_bits``: optional uint32 bit-pack of the same gallery
    (ops/topk_select.pack_bits_serving) — the rescore stage then gathers 8
    bytes/code instead of 64 (+12.5% gallery HBM for ~8x less gather
    traffic). Derived on the fly for exact calls when omitted (one extra
    gallery read per call, ~10ms at 1e8); serve with a precomputed one.

    N must be a multiple of db_block (pad the gallery with +1 rows and mask
    by index if not). ``n_valid``: real row count when the gallery carries
    pad rows (all-zero codes at distance nbit/2, NOT inf-like) — rows >=
    n_valid are masked to +inf so pad indices never surface; may be traced.
    Returns (distances (Q, k) f32, indices (Q, k) i32).
    """
    Q, nbit = query_codes.shape
    packed = db_signs.shape[1] == 128 and nbit != 128
    P = 128 // nbit if packed else 1
    N = db_signs.shape[0] * P
    assert N % db_block == 0, "pad the gallery to a db_block multiple"
    assert db_block % P == 0
    nblocks = N // db_block
    # strict ±1 (0 -> -1): consistent with the mins-kernel path and the
    # pack_bits convention (see retrieve_topk._dist)
    qi = jnp.where(query_codes > 0, 1, -1).astype(jnp.int8)

    # fori_loop + dynamic_slice (NOT scan over a reshaped xs: XLA copies the
    # scan operand into the loop — a second whole-gallery allocation that
    # OOMs at 1e8 entries; the dynamic_slice reads HBM in place)
    def body(bi, carry):
        if packed:
            block = jax.lax.dynamic_slice(
                db_signs, (bi * (db_block // P), 0),
                (db_block // P, 128)).reshape(db_block, nbit)
        else:
            block = jax.lax.dynamic_slice(
                db_signs, (bi * db_block, 0), (db_block, nbit))
        sim = jax.lax.dot_general(qi, block, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        dist = 0.5 * (nbit - sim).astype(jnp.float32)
        if n_valid is not None:
            col = (jnp.arange(db_block, dtype=jnp.int32) + bi * db_block)
            dist = jnp.where(col < n_valid, dist, jnp.inf)
        if exact:
            d, idx = exact_topk_blocked(dist, k)
        else:
            d, idx = jax.lax.approx_min_k(dist, k)
        idx = idx + bi * db_block
        cd, ci = carry
        dd = jnp.concatenate([cd, d], axis=1)
        ii = jnp.concatenate([ci, idx], axis=1)
        nd, sel = jax.lax.top_k(-dd, k)
        return -nd, jnp.take_along_axis(ii, sel, axis=1)

    init = (jnp.full((Q, k), jnp.inf, jnp.float32),
            jnp.full((Q, k), -1, jnp.int32))
    if not exact:
        return jax.lax.fori_loop(0, nblocks, body, init)

    from concepthash_tpu.ops.topk_select import exact_topk_minspass

    # db_bits=None is fine: exact_topk_minspass derives the bit-pack
    # in-call at serving scale (memory-safe chunked build)
    d_fast, i_fast, valid = exact_topk_minspass(qi, db_signs, k,
                                                n_valid=n_valid,
                                                db_bits=db_bits)
    return jax.lax.cond(
        valid, lambda _: (d_fast, i_fast),
        lambda _: jax.lax.fori_loop(0, nblocks, body, init), None)


# ---------------------------------------------------------------------------
# label-pair helpers (reference utils.hashing.get_sim / log_trick)
# ---------------------------------------------------------------------------

def get_sim(y1, y2, onehot: bool = True):
    """Pairwise label-match matrix S_ij = [y1_i ~ y2_j] (bool).

    Call sites: reference models/loss/hashnet.py:73, models/loss/adsh.py."""
    y1 = jnp.asarray(y1)
    y2 = jnp.asarray(y2)
    if not onehot or y1.ndim == 1:
        return y1[:, None] == y2[None, :]
    return jnp.dot(y1.astype(jnp.float32), y2.astype(jnp.float32).T,
                   preferred_element_type=jnp.float32) > 0


def log_trick(x):
    """Numerically stable log(1 + exp(x)) (reference models/loss/hashnet.py:80)."""
    return jax.nn.relu(x) + jnp.log1p(jnp.exp(-jnp.abs(x)))


def normalized_mutual_info(a, b) -> float:
    """NMI between two integer label assignments, arithmetic-mean normalized
    (sklearn normalized_mutual_info_score defaults — the reference evaluates
    pseudo-label quality with it, experiments/train_helper.py:243-251).

    Explicit contingency-table implementation (NumPy, host-side: this runs
    once per eval on O(N) ints — not worth a device round-trip)."""
    import numpy as np

    a = np.asarray(a).ravel()
    b = np.asarray(b).ravel()
    assert a.shape == b.shape
    _, ai = np.unique(a, return_inverse=True)
    _, bi = np.unique(b, return_inverse=True)
    na, nb = ai.max() + 1, bi.max() + 1
    if na == nb == 1:
        return 1.0  # both trivial single-cluster partitions (sklearn :1053)
    cont = np.zeros((na, nb), np.float64)
    np.add.at(cont, (ai, bi), 1.0)
    n = cont.sum()
    pij = cont / n
    pa = pij.sum(1, keepdims=True)
    pb = pij.sum(0, keepdims=True)
    nz = pij > 0
    mi = float((pij[nz] * np.log(pij[nz] / (pa @ pb)[nz])).sum())
    if mi <= 1e-15:
        return 0.0
    ha = -float((pa[pa > 0] * np.log(pa[pa > 0])).sum())
    hb = -float((pb[pb > 0] * np.log(pb[pb > 0])).sum())
    return mi / max((ha + hb) / 2.0, 1e-15)
