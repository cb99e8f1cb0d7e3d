"""ConceptHash model + LGH loss: shapes, loss-formula parity with the
reference's torch math, gradient flow."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from concepthash_tpu.models.clip import AdapterConfig, ClipVisionConfig
from concepthash_tpu.models.concepthash import ConceptHash, ConceptHashConfig
from concepthash_tpu.losses.concepthash import attention_diversity, lgh_loss


VCFG = ClipVisionConfig(hidden_size=64, intermediate_size=128, num_layers=2,
                        num_heads=4, image_size=32, patch_size=8,
                        projection_dim=48)
CCFG = ConceptHashConfig(nbit=16, nclass=5, ncontext=4, num_heads=4,
                         center_dim=48, text_projection_dims=(48,))


@pytest.fixture(scope="module")
def model_and_vars():
    center = np.random.default_rng(0).standard_normal((5, 48)).astype(np.float32)
    model = ConceptHash(VCFG, CCFG, adapters=AdapterConfig(bottleneck_dim=16),
                        fixed_center=jnp.asarray(center))
    imgs = jnp.zeros((4, 32, 32, 3))
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)}, imgs, train=True)
    return model, variables


def test_forward_shapes(model_and_vars):
    model, variables = model_and_vars
    imgs = jnp.asarray(np.random.default_rng(1).standard_normal((4, 32, 32, 3)),
                       jnp.float32)
    out = model.apply(variables, imgs, train=False)
    assert out["codes"].shape == (4, 16)
    assert out["logits_cont"].shape == (4, 5)
    assert out["logits_bin"].shape == (4, 5)
    assert out["logits_concept"].shape == (4, 4, 5)  # (Q, B, C)
    assert out["hash_features"].shape == (4, 4, 64)
    # cosine logits bounded
    assert float(jnp.abs(out["logits_cont"]).max()) <= 1.0 + 1e-5


def test_train_mode_updates_batch_stats(model_and_vars):
    model, variables = model_and_vars
    imgs = jnp.asarray(np.random.default_rng(2).standard_normal((4, 32, 32, 3)),
                       jnp.float32)
    out, mutated = model.apply(variables, imgs, train=True,
                               rngs={"dropout": jax.random.PRNGKey(2)},
                               mutable=["batch_stats"])
    before = variables["batch_stats"]["hash_bn"]["bn"]["mean"]
    after = mutated["batch_stats"]["hash_bn"]["bn"]["mean"]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_lgh_loss_matches_torch_reference(rng):
    """Margin-CE parity with the reference formula (models/loss/coop.py:46-87)
    computed in torch."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    B, C, Q, nbit = 6, 5, 4, 16
    cont = rng.uniform(-1, 1, (B, C)).astype(np.float32)
    binl = rng.uniform(-1, 1, (B, C)).astype(np.float32)
    conc = rng.uniform(-1, 1, (Q, B, C)).astype(np.float32)
    codes = rng.standard_normal((B, nbit)).astype(np.float32)
    y = rng.integers(0, C, B)
    onehot = np.eye(C, dtype=np.float32)[y]
    margin, scale = 0.2, 8.0

    outputs = {"codes": jnp.asarray(codes), "logits_cont": jnp.asarray(cont),
               "logits_bin": jnp.asarray(binl), "logits_concept": jnp.asarray(conc)}
    total, parts = lgh_loss(outputs, jnp.asarray(onehot), margin=margin,
                            scale=scale, ncontext=Q)

    # torch reference math
    ty = torch.from_numpy(y)
    def t_margin_ce(logits):
        t = torch.from_numpy(logits)
        y1h = torch.zeros_like(t).scatter_(-1, ty[:, None], margin)
        return F.cross_entropy(scale * (t - y1h), ty)

    t_cont = t_margin_ce(cont)
    t_bin = t_margin_ce(binl)
    tc = torch.from_numpy(conc)
    y1h = torch.zeros_like(tc).scatter_(-1, ty[None, :, None].expand(Q, B, 1), margin)
    t_conc = F.cross_entropy((scale * (tc - y1h)).reshape(Q * B, C),
                             ty[None].expand(Q, B).reshape(-1))
    tcodes = torch.from_numpy(codes)
    t_quan = (1 - F.cosine_similarity(tcodes, tcodes.sign(), dim=-1)).mean()

    assert float(parts["cont"]) == pytest.approx(float(t_cont), abs=1e-5)
    assert float(parts["bin"]) == pytest.approx(float(t_bin), abs=1e-5)
    assert float(parts["concept"]) == pytest.approx(float(t_conc), abs=1e-5)
    assert float(parts["quan"]) == pytest.approx(float(t_quan), abs=1e-5)
    expected_total = float(t_cont) + float(t_bin) + float(t_conc)
    assert float(total) == pytest.approx(expected_total, abs=1e-4)


def test_loss_gradient_reaches_trainable_params(model_and_vars):
    model, variables = model_and_vars
    imgs = jnp.asarray(np.random.default_rng(3).standard_normal((4, 32, 32, 3)),
                       jnp.float32)
    onehot = jnp.eye(5)[jnp.array([0, 1, 2, 3])]

    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"],
             "constants": variables["constants"]},
            imgs, train=True, rngs={"dropout": jax.random.PRNGKey(0)},
            mutable=["batch_stats"])
        total, _ = lgh_loss(out, onehot, ncontext=4)
        return total

    g = jax.grad(loss_fn)(variables["params"])
    for path in [("hash_queries",), ("hash_pe",), ("hash_fc", "kernel"),
                 ("text_projection", "fc0", "kernel"),
                 ("concept_ce", "centroids"),
                 ("backbone", "layers_0", "adapter_mlp", "up", "kernel")]:
        node = g
        for k in path:
            node = node[k]
        assert float(jnp.abs(node).sum()) > 0, f"no gradient at {path}"


def test_attention_diversity(rng):
    # identical attention maps across concepts -> diversity cos = 1
    B, H, M, P = 2, 3, 4, 9
    L = 1 + P + M
    one_map = rng.uniform(0, 1, (B, H, 1, L)).astype(np.float32)
    attn = np.broadcast_to(one_map, (B, H, L, L)).copy()
    div = attention_diversity((jnp.asarray(attn),), ncontext=M)
    assert float(div) == pytest.approx(1.0, abs=1e-5)


def test_avg_ensemble_and_learnable_center():
    ccfg = ConceptHashConfig(nbit=16, nclass=5, ncontext=4, num_heads=4,
                             ensemble_method="avg", learnable_center=True,
                             concept_reg=False, center_dim=48)
    model = ConceptHash(VCFG, ccfg, adapters=None)
    imgs = jnp.zeros((2, 32, 32, 3))
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)}, imgs, train=True)
    out = model.apply(variables, imgs, train=False)
    assert out["codes"].shape == (2, 16)
    assert out["ensemble_codes"].shape == (2, 4, 16)
    assert "center" in variables["params"]  # learnable


def test_vpt_prompts():
    ccfg = ConceptHashConfig(nbit=16, nclass=5, ncontext=4, num_heads=4,
                             center_dim=48, text_projection_dims=(48,),
                             vpt_pe=True)
    center = np.zeros((5, 48), np.float32)
    model = ConceptHash(VCFG, ccfg, adapters=None, fixed_center=jnp.asarray(center))
    imgs = jnp.zeros((2, 32, 32, 3))
    vs = model.init({"params": jax.random.PRNGKey(0),
                     "dropout": jax.random.PRNGKey(1)}, imgs, train=True)
    assert "vpt_pe_0" in vs["params"]["backbone"]
    assert vs["params"]["backbone"]["vpt_pe_0"].shape == (1, 4, 64)
    out = model.apply(vs, imgs, train=False)
    assert out["codes"].shape == (2, 16)


def test_dbn_whitens_codes(rng):
    """add_bn='dbn' (reference IterNorm DBN): per-group code covariance is
    approximately identity after whitening."""
    from concepthash_tpu.models.layers import DecorrelatedBN

    x = jnp.asarray(rng.standard_normal((256, 16)) @
                    rng.standard_normal((16, 16)), jnp.float32)
    dbn = DecorrelatedBN(groups=4, iters=7)
    vs = dbn.init(jax.random.PRNGKey(0), x, True)
    y, mut = dbn.apply(vs, x, True, mutable=["batch_stats"])
    y = np.asarray(y).reshape(256, 4, 4)
    for g in range(4):
        cov = np.cov(y[:, g, :].T, bias=True)
        np.testing.assert_allclose(cov, np.eye(4), atol=0.15)
    # eval mode uses running stats without mutation
    y2 = dbn.apply({"batch_stats": mut["batch_stats"], **{k: v for k, v in vs.items() if k != "batch_stats"}}, x, False)
    assert np.isfinite(np.asarray(y2)).all()


def test_concepthash_dbn_option():
    ccfg = ConceptHashConfig(nbit=16, nclass=5, ncontext=4, num_heads=4,
                             add_bn="dbn", center_dim=48,
                             text_projection_dims=(48,))
    center = np.zeros((5, 48), np.float32)
    model = ConceptHash(VCFG, ccfg, adapters=None,
                        fixed_center=jnp.asarray(center))
    imgs = jnp.zeros((8, 32, 32, 3))
    vs = model.init({"params": jax.random.PRNGKey(0),
                     "dropout": jax.random.PRNGKey(1)}, imgs, train=True)
    assert "whiten" in vs["batch_stats"]["hash_bn"]
    out, _ = model.apply(vs, imgs, train=True,
                         rngs={"dropout": jax.random.PRNGKey(2)},
                         mutable=["batch_stats"])
    assert out["codes"].shape == (8, 16)


# ---------------------------------------------------------------------------
# SelfAttention-at-last with Gaussian masking (reference coop.py:20-177)
# ---------------------------------------------------------------------------

def _sa_model(**sa_kwargs):
    from concepthash_tpu.models.concepthash import SelfAttnLastConfig

    ccfg = ConceptHashConfig(nbit=16, nclass=5, ncontext=4, num_heads=4,
                             center_dim=48, text_projection_dims=(48,),
                             self_attn_at_last=SelfAttnLastConfig(**sa_kwargs))
    center = np.random.default_rng(0).standard_normal((5, 48)).astype(np.float32)
    model = ConceptHash(VCFG, ccfg, adapters=AdapterConfig(bottleneck_dim=16),
                        fixed_center=jnp.asarray(center))
    imgs = jnp.asarray(np.random.default_rng(3).standard_normal((2, 32, 32, 3)),
                       jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)}, imgs, train=True)
    return model, variables, imgs


def test_self_attn_at_last_shapes_and_attn_cache():
    model, variables, imgs = _sa_model(mask_sigma=0.5)
    out = model.apply(variables, imgs, train=False, output_attentions=True)
    assert out["codes"].shape == (2, 16)
    # one extra attention map appended (reference coop.py:490-492);
    # full sequence = cls + 16 patches + 4 concepts = 21
    assert len(out["attn_cache"]) == VCFG.num_layers + 1
    assert out["attn_cache"][-1].shape == (2, 1, 21, 21)
    assert "self_attn_at_last" in variables["params"]


def test_gaussian_masking_centers_bump_at_argmax():
    """The mask multiplies the concept->patch map by a Gaussian bump that is
    exactly 1 at the map's argmax and decays with distance (reference
    mask_attention_map, coop.py:96-143: raw scores are masked BEFORE softmax,
    so the contract is on the multiplicative bump, not on post-softmax
    mass)."""
    from concepthash_tpu.models.concepthash import (
        SelfAttentionAtLast,
        SelfAttnLastConfig,
    )

    mod = SelfAttentionAtLast(SelfAttnLastConfig(params=False, mask_sigma=0.7),
                              ncontext=4, dim=8)
    rng = np.random.default_rng(5)
    region = jnp.asarray(rng.standard_normal((2, 4, 16)), jnp.float32)
    masked = np.asarray(mod._gaussian_mask(region))
    region = np.asarray(region)
    bump = masked / np.where(np.abs(region) < 1e-9, 1.0, region)
    for b in range(2):
        for m in range(4):
            peak = region[b, m].argmax()
            # bump == 1 at the argmax, <= 1 everywhere, decays with distance
            assert bump[b, m, peak] == pytest.approx(1.0, abs=1e-5)
            assert bump[b, m].max() <= 1.0 + 1e-5
            py, px = divmod(int(peak), 4)
            d = np.array([(py - i) ** 2 + (px - j) ** 2
                          for i in range(4) for j in range(4)], np.float32)
            far, near = d.argmax(), d.argmin()
            assert bump[b, m, far] < bump[b, m, near]

    # end-to-end: rows still softmax-normalized, shapes preserved
    x = jnp.asarray(rng.standard_normal((2, 21, 8)), jnp.float32)
    attn, out = mod.apply({}, x)
    assert out.shape == x.shape
    np.testing.assert_allclose(np.asarray(attn)[:, 0].sum(-1), 1.0, atol=1e-5)


def test_cross_attention_zeroes_outside_region():
    from concepthash_tpu.models.concepthash import (
        SelfAttentionAtLast,
        SelfAttnLastConfig,
    )

    mod = SelfAttentionAtLast(SelfAttnLastConfig(params=False,
                                                 cross_attention=True,
                                                 mask_sigma=0.5),
                              ncontext=4, dim=8)
    x = jnp.asarray(np.random.default_rng(6).standard_normal((1, 21, 8)),
                    jnp.float32)
    attn, _ = mod.apply({}, x)
    attn = np.asarray(attn)[0, 0]
    assert np.abs(attn[:-4]).max() == 0.0          # non-concept rows zeroed
    assert np.abs(attn[-4:, 0]).max() == 0.0       # cls column zeroed
    assert np.abs(attn[-4:, -4:]).max() == 0.0     # concept columns zeroed
    assert np.abs(attn[-4:, 1:-4]).max() > 0.0     # concept->patch region live


def test_sa_config_reachable_from_cli_config():
    from concepthash_tpu.config import load_config
    from concepthash_tpu.methods import get_method
    import os

    cfg_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "configs")
    cfg = load_config(cfg_dir, "train",
                      ["dataset=synthetic", "model=concepthash_sa",
                       "backbone=tiny_test", "model.nbit=16",
                       "model.text_projection_dims=[32]"])
    assert cfg["model"]["self_attn_at_last"]["mask_sigma"] == 0.5
    center = np.zeros((3, 32), np.float32)
    model = get_method("concepthash").build_model(cfg, center)
    assert model.cfg.self_attn_at_last is not None
