"""Method registry: every registered method builds, steps, and produces
finite losses; baseline loss formulas match torch reference math; shallow
fits separate synthetic clusters."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from concepthash_tpu import methods as M
from concepthash_tpu.losses import baselines as L
from concepthash_tpu.losses.shallow import FITTERS, encode_shallow
from concepthash_tpu.ops.retrieval import calculate_mAP
from concepthash_tpu.train.optim import build_optimizer
from concepthash_tpu.train.state import create_train_state, make_train_step

TINY_BACKBONE = {"name": "tiny", "pretrained": False, "hidden_size": 32,
                 "intermediate_size": 64, "num_layers": 2, "num_heads": 4,
                 "patch_size": 8, "image_size": 16, "projection_dim": 32}


def make_config(name, **crit):
    return {
        "model": {"name": name, "nbit": 16, "nclass": 4, "ncontext": 4,
                  "has_adapter": True, "adapter_bottleneck_dim": 8,
                  "text_projection_dims": [32]},
        "backbone": TINY_BACKBONE,
        "criterion": {"name": name, **crit},
        "dataset": {"multiclass": False},
        "seed": 0,
    }


SGD_METHODS = ["concepthash", "orthohash", "orthohash_bcs", "csq", "dpn",
               "hashnet", "dpsh", "dtsh", "greedyhash", "unsup_greedyhash",
               "ce", "a2net_ce", "semicon_ce", "cibhash", "bihalf"]


@pytest.mark.parametrize("name", SGD_METHODS)
def test_method_builds_and_steps(name, rng):
    cfg = make_config(name)
    method = M.get_method(name)
    codebook = M.prepare_codebook(
        method, cfg, text_embedder=lambda names: np.random.default_rng(0)
        .standard_normal((len(names), 32)).astype(np.float32))
    if method.codebook == "signed":
        assert set(np.unique(codebook)) <= {-1.0, 1.0}
        assert codebook.shape == (4, 16)
    cfg["model"]["fixed_center"] = None  # already materialized
    if method.codebook == "continuous":
        assert codebook.shape[0] == 4

    model = method.build_model(cfg, codebook)
    loss_fn = method.build_loss(cfg, codebook)

    sample = jnp.zeros((8, 16, 16, 3))
    k = jax.random.PRNGKey(0)
    params = model.init({"params": k, "dropout": jax.random.fold_in(k, 1)},
                        sample, train=True)["params"]
    tx = build_optimizer({"name": "adam", "lr": 1e-3}, None, 2, 2, params, 0.0)
    state = create_train_state(model, tx, sample, k)
    step = make_train_step(model, loss_fn, tx, donate=False)

    y = rng.integers(0, 4, 8)
    batch = {"image": jnp.asarray(rng.standard_normal((8, 16, 16, 3)),
                                  jnp.float32),
             "label": jnp.asarray(np.eye(4, dtype=np.float32)[y])}
    state1, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"])), name
    state2, metrics2 = step(state1, batch)
    assert np.isfinite(float(metrics2["loss"])), name


def test_odc_online_memory_updates(rng):
    """ODC custom step (reference trainers/odc.py:10-49,105-171): the
    per-sample memory EMAs toward the new codes, the batch's pseudo-labels
    are reassigned against the current centroids, and the centroid refresh
    fires on the update_interval boundary."""
    cfg = make_config("odc", update_interval=2, memory_momentum=0.5)
    method = M.get_method("odc")
    assert method.custom_step is not None
    model = method.build_model(cfg, None)

    sample = jnp.zeros((8, 16, 16, 3))
    k = jax.random.PRNGKey(0)
    params = model.init({"params": k, "dropout": jax.random.fold_in(k, 1)},
                        sample, train=True)["params"]
    tx = build_optimizer({"name": "adam", "lr": 1e-3}, None, 2, 2, params, 0.0)
    state = create_train_state(model, tx, sample, k)

    n, nbit, nclass = 16, 16, 4
    feats = rng.standard_normal((n, nbit)).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    labels = rng.integers(0, nclass, n).astype(np.int32)
    cents = np.stack([feats[labels == c].mean(0) for c in range(nclass)])
    state = state.replace(extra={
        "features": jnp.asarray(feats), "labels": jnp.asarray(labels),
        "centroids": jnp.asarray(cents),
        "weights": jnp.ones((nclass,), jnp.float32)})

    step = method.custom_step(model, cfg, tx, None, 4)
    idx = np.arange(8, dtype=np.int32)
    batch = {"image": jnp.asarray(rng.standard_normal((8, 16, 16, 3)),
                                  jnp.float32),
             "label": jnp.zeros((8, nclass), jnp.float32),
             "index": jnp.asarray(idx)}
    state1, m1 = step(state, batch)
    assert np.isfinite(float(m1["loss"]))
    # touched memory rows moved, untouched rows identical
    f1 = np.asarray(state1.extra["features"])
    assert not np.allclose(f1[:8], feats[:8])
    np.testing.assert_array_equal(f1[8:], feats[8:])
    # step at state.step=0: 0 % 2 == 0 -> refresh fires on the very first
    # batch after k-means init (reference trainers/odc.py:162 global_step
    # semantics); centroids move toward the updated memory
    c1 = np.asarray(state1.extra["centroids"])
    assert not np.allclose(c1, cents)
    # refresh renormalizes the class weights to sum 1 (set_reweight)
    np.testing.assert_allclose(
        float(np.asarray(state1.extra["weights"]).sum()), 1.0, atol=1e-5)
    state2, _ = step(state1, batch)
    # step at state.step=1: 1 % 2 != 0 -> no refresh this step
    np.testing.assert_array_equal(np.asarray(state2.extra["centroids"]), c1)
    # reassigned labels stay in range
    l2 = np.asarray(state2.extra["labels"])
    assert l2.min() >= 0 and l2.max() < nclass


def test_language_codebook_continuous_and_quantized():
    cfg = make_config("concepthash")
    cfg["model"]["fixed_center"] = {"codebook_method": "L", "quantized": False,
                                    "class_names": ["a", "b", "c", "d"]}
    method = M.get_method("concepthash")
    embedder = lambda names: np.random.default_rng(1).standard_normal(
        (len(names), 32)).astype(np.float32)
    emb = M.prepare_codebook(method, cfg, text_embedder=embedder)
    assert emb.shape == (4, 32)  # continuous centers, raw width

    # quantized 'L' path (lg_pca OrthoHash): signed (nclass, nbit)
    names = [f"c{i}" for i in range(20)]
    cfg2 = make_config("orthohash")
    cfg2["model"]["nclass"] = 20
    cfg2["model"]["codebook"] = {"codebook_method": "L", "quantized": True,
                                 "binary_method": "pca",
                                 "class_names": names}
    cb = M.prepare_codebook(M.get_method("orthohash"), cfg2,
                            text_embedder=embedder)
    assert cb.shape == (20, 16)
    assert set(np.unique(cb)) <= {-1.0, 1.0}


@pytest.mark.parametrize("loss_name,loss_fn", [
    ("hashnet", L.hashnet_loss), ("dpsh", L.dpsh_loss)])
def test_pairwise_losses_match_torch(loss_name, loss_fn, rng):
    torch = pytest.importorskip("torch")

    u = rng.standard_normal((10, 16)).astype(np.float32)
    y = np.eye(4, dtype=np.float32)[rng.integers(0, 4, 10)]
    ours, _ = loss_fn({"codes": jnp.asarray(u)}, jnp.asarray(y))

    tu = torch.from_numpy(u)
    ty = torch.from_numpy(y)
    sim = (ty @ ty.t() > 0).float()
    if loss_name == "hashnet":
        th = torch.tanh(tu)
        dot = th @ th.t()
    else:
        dot = (tu @ tu.t()) / 2
    lt = torch.nn.functional.relu(dot) + torch.log1p(torch.exp(-dot.abs()))
    exp_loss = lt - sim * dot
    S1, S0 = sim.sum(), (1 - sim).sum()
    S = S1 + S0
    w = torch.where(sim > 0, S / S1, S / S0)
    expected = (exp_loss * w).sum() / S
    if loss_name == "dpsh":
        expected = expected + ((tu - tu.sign()) ** 2).mean()
    assert float(ours) == pytest.approx(float(expected), rel=1e-5)


def test_dtsh_vectorization_matches_loop(rng):
    """The reference computes DTSH with a Python row loop
    (models/loss/dtsh.py:29-38); our masked vectorization must agree."""
    u = rng.standard_normal((12, 8)).astype(np.float32)
    y = np.eye(3, dtype=np.float32)[rng.integers(0, 3, 12)]
    alpha, lmbd = 5.0, 1.0
    ours, parts = L.dtsh_loss({"codes": jnp.asarray(u)}, jnp.asarray(y),
                              alpha=alpha, lmbd=lmbd)

    ip = u @ u.T
    s = (y @ y.T) > 0
    count, loss1 = 0, 0.0
    for row in range(12):
        if s[row].sum() != 0 and (~s[row]).sum() != 0:
            count += 1
            tp = ip[row][s[row]]
            tn = ip[row][~s[row]]
            triple = np.clip(tp[:, None] - tn[None, :] - alpha, -100, 50)
            loss1 += -(triple - np.log1p(np.exp(triple))).mean()
    loss1 = loss1 / max(count, 1)
    loss2 = ((u - np.sign(u)) ** 2).mean()
    assert float(ours) == pytest.approx(loss1 + lmbd * loss2, rel=1e-4)


def test_csq_dpn_losses(rng):
    codebook = jnp.asarray(np.sign(rng.standard_normal((4, 16))), jnp.float32)
    u = rng.standard_normal((6, 16)).astype(np.float32)
    y = np.eye(4, dtype=np.float32)[rng.integers(0, 4, 6)]
    total, parts = L.csq_loss({"codes": jnp.asarray(u)}, jnp.asarray(y),
                              codebook=codebook, lambda_q=1e-4)
    assert np.isfinite(float(total))
    assert float(parts["center"]) > 0
    total, parts = L.dpn_loss({"codes": jnp.asarray(u)}, jnp.asarray(y),
                              codebook=codebook)
    assert np.isfinite(float(total))
    # perfect codes -> hinge loss small
    perfect = codebook[jnp.asarray(y.argmax(1))] * 2.0
    t2, _ = L.dpn_loss({"codes": perfect}, jnp.asarray(y), codebook=codebook)
    assert float(t2) < float(total)


@pytest.mark.parametrize("name", ["itq", "pca", "lsh", "sh"])
def test_shallow_fits_separate_clusters(name, rng):
    protos = rng.standard_normal((4, 32)).astype(np.float32) * 4
    y = rng.integers(0, 4, 80)
    feats = (protos[y] + rng.standard_normal((80, 32))).astype(np.float32)
    onehot = np.eye(4, dtype=np.float32)[y]
    state = FITTERS[name](feats, 16)
    codes = encode_shallow(state, feats)
    assert codes.shape == (80, 16)
    mAP, _, _ = calculate_mAP(codes, onehot, codes, onehot, R=-1)
    assert mAP > (0.5 if name == "pca" else 0.8), f"{name} mAP={mAP}"


def test_hadamard_codebook_properties():
    from concepthash_tpu.train.codebook import get_codebook

    cb = get_codebook("H", nclass=10, nbit=16)
    assert cb.shape == (10, 16)
    assert set(np.unique(cb)) <= {-1.0, 1.0}
    # hadamard rows are mutually orthogonal within the first nbit rows
    g = cb[:8] @ cb[:8].T
    assert np.abs(g - np.diag(np.diag(g))).max() == 0


def test_maxmin_codebook():
    from concepthash_tpu.train.codebook import get_codebook

    cb = get_codebook("O", nclass=6, nbit=16, seed=3)
    d = 0.5 * (16 - cb @ cb.T) / 16
    off = d[~np.eye(6, dtype=bool)]
    assert off.min() > 0.15


@pytest.mark.parametrize("backbone", [
    {"family": "resnet", "depth": 18},
    {"family": "vit", "hidden_size": 32, "intermediate_size": 64,
     "num_layers": 2, "num_heads": 4, "patch_size": 8, "image_size": 16,
     "projection_dim": 32},
])
def test_alternative_trunks(backbone, rng):
    cfg = make_config("csq")
    cfg["backbone"] = backbone
    method = M.get_method("csq")
    codebook = M.prepare_codebook(method, cfg)
    model = method.build_model(cfg, codebook)
    loss_fn = method.build_loss(cfg, codebook)
    sample = jnp.zeros((4, 16, 16, 3))
    k = jax.random.PRNGKey(0)
    tx = build_optimizer({"name": "adam", "lr": 1e-3}, None, 2, 2,
                         model.init({"params": k}, sample, train=True)["params"],
                         1.0)
    state = create_train_state(model, tx, sample, k)
    step = make_train_step(model, loss_fn, tx, donate=False)
    y = rng.integers(0, 4, 4)
    batch = {"image": jnp.asarray(rng.standard_normal((4, 16, 16, 3)), jnp.float32),
             "label": jnp.asarray(np.eye(4, dtype=np.float32)[y])}
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))


def test_identity_trunk(rng):
    cfg = make_config("ce")
    cfg["backbone"] = {"family": "identity"}
    method = M.get_method("ce")
    model = method.build_model(cfg, None)
    feats = jnp.asarray(rng.standard_normal((4, 32)), jnp.float32)
    vs = model.init({"params": jax.random.PRNGKey(0)}, feats, train=False)
    out = model.apply(vs, feats, train=False)
    assert out["codes"].shape == (4, 16)
    assert out["logits"].shape == (4, 4)


def test_orthohash_bcs_sign_centroid_head(rng):
    """OrthoHashWithBCS (reference models/arch/orthohash.py:57-63): logits2
    is the cosine of the codes against SIGN-quantized shared centroids, and
    bcs_scale blends it into the margin CE."""
    cfg = make_config("orthohash_bcs")
    method = M.get_method("orthohash_bcs")
    codebook = M.prepare_codebook(method, cfg)
    model = method.build_model(cfg, codebook)

    sample = jnp.asarray(rng.standard_normal((4, 16, 16, 3)), jnp.float32)
    k = jax.random.PRNGKey(1)
    variables = model.init({"params": k, "dropout": jax.random.fold_in(k, 1)},
                           sample, train=True)
    out = model.apply(variables, sample, train=False)
    assert "logits2" in out

    # expected: normalize(codes) @ normalize(sign(centroids)).T — centroids
    # here are the fixed signed codebook (constants collection)
    codes = np.asarray(out["codes"], np.float64)
    cents = np.sign(np.asarray(codebook, np.float64))
    xn = codes / np.linalg.norm(codes, axis=1, keepdims=True)
    cn = cents / np.linalg.norm(cents, axis=1, keepdims=True)
    np.testing.assert_allclose(np.asarray(out["logits2"]), xn @ cn.T,
                               atol=1e-5)
    # signed codebook: logits == logits2 (centroids already in {-1,1})
    np.testing.assert_allclose(np.asarray(out["logits"]),
                               np.asarray(out["logits2"]), atol=1e-5)

    # loss blend: bcs_scale=1 averages the two logits before the margin CE
    onehot = np.eye(4, dtype=np.float32)
    out2 = dict(out)
    # force a non-uniform difference (a constant shift would be softmax-
    # invariant and hide the blend)
    out2["logits2"] = out["logits2"] + jnp.asarray(
        rng.standard_normal(out["logits2"].shape), jnp.float32)
    l0, _ = L.orthohash_loss(out2, onehot, bcs_scale=0.0)
    l1, _ = L.orthohash_loss(out2, onehot, bcs_scale=1.0)
    blended = dict(out)
    blended["logits"] = (out2["logits"] + out2["logits2"]) / 2.0
    lb, _ = L.orthohash_loss(blended, onehot)
    np.testing.assert_allclose(float(l1), float(lb), atol=1e-6)
    assert not np.allclose(float(l0), float(l1))


def test_soften_sim_matches_reference_rebalance():
    """The adsh-regime soft-similarity rebalance (reference
    trainers/adsh.py:148-150): positives stay exactly +1; for C balanced
    classes negatives land at -P/N (about -1/(C-1)), not -1. Omitting it
    collapsed adsh at the 24-class medium parity scale (PARITY.md)."""
    from concepthash_tpu.losses.baselines import soften_sim
    from concepthash_tpu.ops.retrieval import get_sim

    rng = np.random.default_rng(0)
    C, M = 8, 5  # 8 balanced classes, 5 items each
    labels = np.repeat(np.arange(C), M)
    onehot = np.eye(C, dtype=np.float32)[labels]
    S = np.asarray(get_sim(onehot, onehot)).astype(np.float32) * 2 - 1
    soft = soften_sim(S)

    # independent transcription of the reference formula
    r = S.sum() / (1.0 - S).sum()
    np.testing.assert_allclose(soft, S * (1.0 + r) - r, rtol=1e-6)

    pos, neg = soft[S > 0], soft[S < 0]
    np.testing.assert_allclose(pos, 1.0, atol=1e-6)
    n_pos, n_neg = (S > 0).sum(), (S < 0).sum()
    np.testing.assert_allclose(neg, -n_pos / n_neg, rtol=1e-5)
    assert neg.max() < 0 and neg.min() > -0.25  # near-orthogonal, not -1


def test_soften_sim_all_positive_is_finite_identity():
    """Single-class batches make S all +1; the rebalance ratio r=sum/0
    would NaN the adsh loss and solve_dcc (round-4 review finding). The
    guard keeps soften_sim an identity there and leaves mixed S unchanged."""
    from concepthash_tpu.losses.baselines import soften_sim

    S = np.ones((4, 4), np.float32)
    np.testing.assert_allclose(np.asarray(soften_sim(S)), S)
    # negative-dominated S (3 singleton classes): r = -3/12 = -0.25,
    # negatives soften -1 -> -(1+2r) = -0.5, positives stay exactly +1
    S2 = (np.eye(3, dtype=np.float32) * 2.0) - 1.0
    out = np.asarray(soften_sim(S2))
    assert np.isfinite(out).all()
    np.testing.assert_allclose(np.diag(out), 1.0)
    np.testing.assert_allclose(out[0, 1], -0.5)
