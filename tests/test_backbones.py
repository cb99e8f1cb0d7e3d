"""Backbone-family fill-ins: Swin (windowed attention + shift masks +
patch merging), AlexNet, VGG16 (reference swinvit.py / alexnet.py /
vgg16.py). Shapes, gradients, and the static shift-mask math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from concepthash_tpu.models.swin import (SwinConfig, SwinTransformer,
                                         _relative_position_index,
                                         _shift_attn_mask)
from concepthash_tpu.models.trunk import trunk_from_config


def _forward(trunk, img_hw, train=False):
    imgs = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, img_hw, img_hw, 3)),
        jnp.float32)
    variables = trunk.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)},
                           imgs, train=train)
    return trunk.apply(variables, imgs, train=train,
                       rngs={"dropout": jax.random.PRNGKey(2)} if train
                       else None), variables


def test_swin_forward_shapes():
    cfg = SwinConfig(variant="test", image_size=32, window_size=4)
    model = SwinTransformer(cfg)
    (out, _) = _forward(model, 32)[0], None
    # image 32 / patch 4 = 8; three merges -> 1x1 grid at dim 16*8
    assert out["features"].shape == (2, cfg.features_size) == (2, 128)
    assert out["tokens"].shape == (2, 1, 128)
    assert np.isfinite(np.asarray(out["features"])).all()


def test_swin_shift_mask_blocks_cross_region():
    """Positions from different pre-shift regions must get -inf-ish bias;
    same-region pairs must get 0 (Swin SW-MSA mask)."""
    m = _shift_attn_mask(8, 8, 4, 2)
    assert m.shape == (4, 16, 16)
    assert (m == 0).any() and (m < -1e8).any()
    # the top-left window contains no region boundary -> fully unmasked
    np.testing.assert_array_equal(m[0], 0)
    # diagonal (self-attention) is always allowed
    for w in range(4):
        np.testing.assert_array_equal(np.diag(m[w]), 0)


def test_swin_relative_position_index():
    idx = _relative_position_index(3)
    assert idx.shape == (9, 9) and idx.min() >= 0 and idx.max() < 25
    # symmetric displacement pairs map to mirrored table entries
    assert idx[0, 8] == 0 and idx[8, 0] == 24 and idx[4, 4] == 12


def test_swin_gradients_flow():
    cfg = SwinConfig(variant="test", image_size=32, window_size=2)
    model = SwinTransformer(cfg)
    imgs = jnp.ones((1, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(0), imgs)["params"]
    g = jax.grad(lambda p: (model.apply({"params": p}, imgs)["features"]
                            ** 2).sum())(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # relative position bias tables receive gradient
    assert any(np.abs(np.asarray(l)).sum() > 0 for l in leaves)


@pytest.mark.parametrize("family,img,dim", [("alexnet", 64, 4096),
                                            ("vgg16", 32, 4096)])
def test_convnet_trunks(family, img, dim):
    trunk = trunk_from_config({"family": family})
    out, _ = _forward(trunk, img, train=True)
    assert out["features"].shape == (2, dim)
    assert np.isfinite(np.asarray(out["features"])).all()


def test_swin_via_trunk_factory():
    trunk = trunk_from_config({"family": "swin", "variant": "test",
                               "image_size": 32, "window_size": 4})
    out, _ = _forward(trunk, 32)
    assert out["features"].shape == (2, 128)


def test_text_tower_accepts_image_token_embeds():
    """ImageToTextTokenCLIPTextTransformer parity (ref clip.py:137-214):
    image embeddings enter the text transformer as token embeddings."""
    from concepthash_tpu.models.clip import ClipTextConfig, ClipTextTower

    cfg = ClipTextConfig(vocab_size=64, hidden_size=32, intermediate_size=64,
                         num_layers=2, num_heads=4,
                         max_position_embeddings=16, projection_dim=32)
    tower = ClipTextTower(cfg)
    embeds = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 5, 48)), jnp.float32)
    variables = tower.init(jax.random.PRNGKey(0), inputs_embeds=embeds)
    out = tower.apply(variables, inputs_embeds=embeds)
    assert out["last_hidden_state"].shape == (2, 5, 32)
    assert out["text_embeds"].shape == (2, 32)
    # pooled is the LAST position (no eos token in the image-token path)
    np.testing.assert_array_equal(np.asarray(out["pooled"]),
                                  np.asarray(out["last_hidden_state"][:, -1]))


def test_adaptive_avg_pool_matches_torch_semantics():
    import torch

    from concepthash_tpu.models.convnets import _adaptive_avg_pool

    x = np.random.default_rng(1).standard_normal((1, 10, 10, 3)).astype(
        np.float32)
    ours = np.asarray(_adaptive_avg_pool(jnp.asarray(x), 6))
    theirs = torch.nn.functional.adaptive_avg_pool2d(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), 6).numpy().transpose(
        0, 2, 3, 1)
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)
