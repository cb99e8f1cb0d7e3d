"""Shared layers: CosSim variants vs a direct torch transcription of the
reference module (models/layers/cossim.py:6-82), sign-STE gradient."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from concepthash_tpu.models.layers import CosSim, sign_ste


def torch_cossim(x, cent, group=1, single_quan=False, input_group=1,
                 sign_centroids=False):
    """Direct transcription of the reference forward (cossim.py:37-82)."""
    x = torch.from_numpy(x)
    centroids = torch.from_numpy(cent)
    nclass = centroids.shape[0]
    if sign_centroids:
        centroids = torch.sign(centroids)
    if single_quan:
        cg = centroids.reshape(nclass, group, -1)
        xg = x.reshape(x.size(0), group, -1)
        nfeat = F.normalize(xg, p=2, dim=-1).reshape(x.size(0), -1)
        nc = F.normalize(cg, p=2, dim=-1)
        ncs = nc.sign().reshape(nclass, -1)
        nc = nc.reshape(nclass, -1)
        return ((nfeat @ nc.t() / group) + (nfeat @ ncs.t() / group)) * 0.5
    if input_group != 1:
        xg = x.reshape(x.size(0), input_group, -1)
        nfeat = F.normalize(xg, p=2, dim=-1)
        nc = F.normalize(centroids, p=2, dim=-1)
        nfeat = F.normalize(nfeat.reshape(x.size(0), -1), p=2, dim=-1)
        nc = nc.reshape(nclass, -1)
        return nfeat @ nc.t() / group
    cg = centroids.reshape(nclass, group, -1)
    xg = x.reshape(x.size(0), group, -1)
    nfeat = F.normalize(xg, p=2, dim=-1).reshape(x.size(0), -1)
    nc = F.normalize(cg, p=2, dim=-1).reshape(nclass, -1)
    return nfeat @ nc.t() / group


@pytest.mark.parametrize("kw", [dict(), dict(group=4), dict(input_group=4),
                                dict(group=4, single_quan=True),
                                dict(sign_centroids=True)])
def test_cossim_matches_reference_transcription(rng, kw):
    sign_c = kw.pop("sign_centroids", False)
    x = rng.standard_normal((6, 16)).astype(np.float32)
    cent = rng.standard_normal((5, 16)).astype(np.float32)
    layer = CosSim(nfeat=16, nclass=5, codebook=cent, **kw)
    variables = layer.init(jax.random.PRNGKey(0), jnp.asarray(x))
    ours = layer.apply(variables, jnp.asarray(x), sign_centroids=sign_c)
    theirs = torch_cossim(x, cent, sign_centroids=sign_c, **kw).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-5, atol=1e-5)


def test_l2_normalize_gradient_finite_at_zero():
    """x/(norm+eps) has a NaN backward at x=0; l2_normalize must not.
    Regression: zero-init bias chains make projected class centers exactly
    zero at step 0, which poisoned the whole state with one NaN gradient."""
    from concepthash_tpu.ops.numerics import l2_normalize

    g = jax.grad(lambda x: l2_normalize(x).sum())(jnp.zeros(8))
    assert np.isfinite(np.asarray(g)).all()
    # and matches the plain normalize away from zero
    x = jnp.asarray([3.0, 4.0])
    np.testing.assert_allclose(np.asarray(l2_normalize(x)), [0.6, 0.8],
                               rtol=1e-6)


def test_concepthash_grads_finite_with_zero_center(rng):
    """Full LGH backward with an all-zero fixed_center (the dryrun/default
    offline configuration) must produce finite gradients everywhere."""
    from concepthash_tpu.losses.concepthash import lgh_loss
    from concepthash_tpu.models.clip import AdapterConfig, ClipVisionConfig
    from concepthash_tpu.models.concepthash import ConceptHash, ConceptHashConfig

    vcfg = ClipVisionConfig(hidden_size=32, intermediate_size=64, num_layers=1,
                            num_heads=4, image_size=16, patch_size=8,
                            projection_dim=32)
    ccfg = ConceptHashConfig(nbit=16, nclass=4, ncontext=4, center_dim=32,
                             text_projection_dims=(32,))
    model = ConceptHash(vcfg, ccfg, adapters=AdapterConfig(bottleneck_dim=8),
                        fixed_center=jnp.zeros((4, 32)))
    imgs = jnp.asarray(rng.standard_normal((4, 16, 16, 3)), jnp.float32)
    y = jnp.eye(4, dtype=jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)}, imgs, train=True)

    def loss(params):
        out, _ = model.apply(
            {"params": params, **{k: v for k, v in variables.items()
                                  if k != "params"}},
            imgs, train=True, rngs={"dropout": jax.random.PRNGKey(2)},
            mutable=["batch_stats"])
        total, _ = lgh_loss(out, y, ncontext=4)
        return total

    grads = jax.grad(loss)(variables["params"])
    bad = [str(p) for p, l in
           jax.tree_util.tree_leaves_with_path(grads)
           if not np.isfinite(np.asarray(l)).all()]
    assert not bad, f"non-finite grads in {bad}"


def test_sign_ste_gradient_is_identity():
    g = jax.grad(lambda x: (sign_ste(x) * jnp.arange(1.0, 4.0)).sum())(
        jnp.asarray([0.5, -2.0, 3.0]))
    np.testing.assert_allclose(np.asarray(g), [1.0, 2.0, 3.0])
