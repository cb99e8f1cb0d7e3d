"""Retrieval scoring for the reference side (the upstream implementation is
the missing sdc ``utils/hashing.py``; semantics reconstructed from call sites
— SURVEY.md §2.6: experiments/train_helper.py:228-234,
experiments/test_hashing.py:106-168, trainers/orthohash.py:362,
models/loss/{hashnet,adsh,dpsh}.py).

This is an INDEPENDENT torch/NumPy implementation, written to the same
pinned semantics as the rebuild's concepthash_tpu/ops/retrieval.py
(ascending distance, stable tie-break by database index, AP@R excluding
queries with no relevant item in top R) so reference-side scores and
rebuild-side scores are directly comparable. The rebuild's JAX version is
separately parity-tested against a NumPy oracle (tests/test_retrieval.py);
parity/compare.py cross-checks the two on identical dumped codes."""

from __future__ import annotations

import numpy as np
import torch


def _to_np(x):
    if isinstance(x, torch.Tensor):
        return x.detach().cpu().numpy()
    return np.asarray(x)


def _sign_codes(codes: np.ndarray, threshold: float = 0.0) -> np.ndarray:
    if threshold != 0.0:  # ternary: |c| <= threshold -> 0
        s = np.sign(codes)
        s[np.abs(codes) <= threshold] = 0.0
        return s
    s = np.sign(codes)
    s[s == 0] = 1.0
    return s


def get_hamm_dist(codes, codebook, normalize: bool = False):
    """(B, nbit) continuous codes vs (C, nbit) +-1 codebook ->
    (B, C) Hamming distances (reference trainers/orthohash.py:362)."""
    c = torch.as_tensor(_to_np(codes), dtype=torch.float32)
    cb = torch.as_tensor(_to_np(codebook), dtype=torch.float32)
    nbit = c.size(1)
    d = 0.5 * (nbit - torch.sign(c) @ cb.t())
    if normalize:
        d = d / nbit
    return d


def get_sim(y1, y2, onehot: bool = True):
    """Pairwise any-shared-label relevance (reference models/loss/hashnet.py:73)."""
    a = torch.as_tensor(_to_np(y1), dtype=torch.float32)
    b = torch.as_tensor(_to_np(y2), dtype=torch.float32)
    if a.dim() == 1:
        a = torch.nn.functional.one_hot(a.long()).float()
        b = torch.nn.functional.one_hot(b.long()).float()
    return (a @ b.t()) > 0


def log_trick(x):
    """Numerically stable log(1 + e^x) (reference models/loss/dpsh.py:65)."""
    x = torch.as_tensor(x)
    return torch.clamp(x, min=0) + torch.log1p(torch.exp(-torch.abs(x)))


def _distances(db_codes, query_codes, dist_metric: str, threshold: float):
    if dist_metric == "hamming":
        q = _sign_codes(query_codes, threshold)
        d = _sign_codes(db_codes, threshold)
        nbit = q.shape[1]
        return 0.5 * (nbit - q @ d.T)
    if dist_metric == "cosine":
        qn = query_codes / (np.linalg.norm(query_codes, axis=1, keepdims=True) + 1e-12)
        dn = db_codes / (np.linalg.norm(db_codes, axis=1, keepdims=True) + 1e-12)
        return 1.0 - qn @ dn.T
    if dist_metric == "euclidean":
        q2 = (query_codes ** 2).sum(1, keepdims=True)
        d2 = (db_codes ** 2).sum(1, keepdims=True)
        return q2 + d2.T - 2 * query_codes @ db_codes.T
    raise ValueError(dist_metric)


def calculate_mAP(db_codes, db_labels, query_codes, query_labels, R=-1,
                  dist_metric: str = "hamming", PRs=(1, 5, 10),
                  threshold: float = 0.0, remove_first_retrieved: bool = False,
                  landmark_gt=None, db_id=None, test_id=None,
                  multiclass: bool = False, **_ignored):
    """Returns (mAP, recalls, precisions); R may be -1 (all), an int, or a
    list (-> list of mAPs). recalls/precisions align with PRs."""
    db_codes = _to_np(db_codes).astype(np.float32)
    query_codes = _to_np(query_codes).astype(np.float32)
    db_labels = _to_np(db_labels).astype(np.float32)
    query_labels = _to_np(query_labels).astype(np.float32)

    dist = _distances(db_codes, query_codes, dist_metric, float(threshold))
    rel = (query_labels @ db_labels.T) > 0

    order = np.argsort(dist, axis=1, kind="stable")  # ties -> db index
    rel_sorted = np.take_along_axis(rel, order, axis=1)
    if remove_first_retrieved:
        rel_sorted = rel_sorted[:, 1:]
    nq, n = rel_sorted.shape

    cum = np.cumsum(rel_sorted.astype(np.float64), axis=1)
    prec_at = cum / np.arange(1, n + 1, dtype=np.float64)

    Rs = list(R) if isinstance(R, (list, tuple)) else [R]
    mAPs = []
    for r in Rs:
        r = n if (r == -1 or r > n) else int(r)
        ap_num = (prec_at[:, :r] * rel_sorted[:, :r]).sum(axis=1)
        rel_count = cum[:, r - 1]
        has = rel_count > 0
        mAPs.append(float((ap_num[has] / rel_count[has]).mean()) if has.any()
                    else 0.0)

    total_rel = rel.sum(axis=1).astype(np.float64)
    if remove_first_retrieved:
        total_rel = np.maximum(total_rel - 1.0, 0.0)
    precisions, recalls = [], []
    for k in PRs or ():
        kk = min(int(k), n)
        topk = cum[:, kk - 1]
        precisions.append(float((topk / kk).mean()))
        has = total_rel > 0
        recalls.append(float((topk[has] / total_rel[has]).mean()) if has.any()
                       else 0.0)

    mAP = mAPs if isinstance(R, (list, tuple)) else mAPs[0]
    return mAP, recalls, precisions


def calculate_pr_curve(db_codes, db_labels, query_codes, query_labels,
                       dist_metric: str = "hamming", threshold: float = 0.0,
                       remove_first_retrieved: bool = False,
                       num_points: int = 50, **_ignored):
    """PR over log-spaced rank cutoffs — same reconstruction as the rebuild's
    ops/retrieval.calculate_pr_curve (the upstream impl is missing; this
    keeps the two sides comparable)."""
    ndb = _to_np(db_codes).shape[0]
    n = ndb - 1 if remove_first_retrieved else ndb
    Rs = sorted(set(np.unique(np.geomspace(1, n, num_points).astype(int)).tolist()))
    _, recalls, precisions = calculate_mAP(
        db_codes, db_labels, query_codes, query_labels, R=-1,
        dist_metric=dist_metric, PRs=tuple(Rs), threshold=threshold,
        remove_first_retrieved=remove_first_retrieved)
    return recalls, precisions, list(Rs)
