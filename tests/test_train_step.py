"""pjit data-parallel training over the 8-device virtual CPU mesh: loss goes
down, batch stats sync globally, frozen backbone stays frozen."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from concepthash_tpu.models.clip import AdapterConfig, ClipVisionConfig
from concepthash_tpu.models.concepthash import ConceptHash, ConceptHashConfig
from concepthash_tpu.losses.concepthash import lgh_loss
from concepthash_tpu.parallel.mesh import make_mesh, pad_to_multiple, replicate, shard_batch
from concepthash_tpu.train.optim import build_optimizer, param_labels
from concepthash_tpu.train.state import (
    TrainState,
    create_train_state,
    make_eval_step,
    make_train_step,
)

VCFG = ClipVisionConfig(hidden_size=32, intermediate_size=64, num_layers=2,
                        num_heads=4, image_size=16, patch_size=8,
                        projection_dim=32)
CCFG = ConceptHashConfig(nbit=16, nclass=4, ncontext=4, num_heads=4,
                         center_dim=32, text_projection_dims=(32,))


def build(mesh=None, backbone_lr_scale=0.0):
    center = np.random.default_rng(0).standard_normal((4, 32)).astype(np.float32)
    model = ConceptHash(VCFG, CCFG, adapters=AdapterConfig(bottleneck_dim=8),
                        fixed_center=jnp.asarray(center))

    def loss_fn(outputs, batch):
        return lgh_loss(outputs, batch["label"], ncontext=4)

    sample = jnp.zeros((8, 16, 16, 3))
    init_params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        sample, train=True)["params"]
    tx = build_optimizer({"name": "sgd", "lr": 0.01, "momentum": 0.9},
                         {"name": "csw", "warmup_epochs": 1},
                         epochs=4, steps_per_epoch=2, params=init_params,
                         backbone_lr_scale=backbone_lr_scale)
    state0 = create_train_state(model, tx, sample, jax.random.PRNGKey(0))
    step = make_train_step(model, loss_fn, tx, mesh=mesh)
    return model, loss_fn, state0, step


def make_batch(rng, n=8):
    protos = rng.standard_normal((4, 16, 16, 3)).astype(np.float32)
    y = rng.integers(0, 4, n)
    img = protos[y] + 0.05 * rng.standard_normal((n, 16, 16, 3)).astype(np.float32)
    return {"image": img, "label": np.eye(4, dtype=np.float32)[y],
            "index": np.arange(n, dtype=np.int32)}


def test_loss_decreases_on_mesh(rng):
    mesh = make_mesh()
    assert mesh.devices.size == 8
    model, loss_fn, state, step = build(mesh)
    state = replicate(state, mesh)
    losses = []
    for i in range(10):
        batch = shard_batch(make_batch(rng), mesh)
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert np.mean(losses[-3:]) < np.mean(losses[:3]), losses
    assert int(state.step) == 10


def test_frozen_backbone_under_dp(rng):
    mesh = make_mesh()
    model, loss_fn, state, step = build(mesh, backbone_lr_scale=0.0)
    before = np.asarray(state.params["backbone"]["layers_0"]["fc1"]["kernel"]).copy()
    adapter_before = np.asarray(
        state.params["backbone"]["layers_0"]["adapter_mlp"]["up"]["kernel"]).copy()
    hash_before = np.asarray(state.params["hash_fc"]["kernel"]).copy()
    state = replicate(state, mesh)
    for _ in range(3):
        state, _ = step(state, shard_batch(make_batch(rng), mesh))
    after = np.asarray(state.params["backbone"]["layers_0"]["fc1"]["kernel"])
    np.testing.assert_array_equal(before, after)
    # heads and adapters moved
    assert not np.allclose(hash_before, np.asarray(state.params["hash_fc"]["kernel"]))
    # adapter up-kernel is zero-init; it should move after >=2 steps
    assert not np.allclose(adapter_before,
                           np.asarray(state.params["backbone"]["layers_0"]
                                      ["adapter_mlp"]["up"]["kernel"]))


def test_batchnorm_stats_are_global(rng):
    """BN batch mean under pjit must equal the global batch mean (not
    per-shard), or data-parallel mAP silently drifts (SURVEY.md §7 #2)."""
    mesh = make_mesh()
    model, loss_fn, state, step = build(mesh)
    batch = make_batch(rng, 8)
    # single-device reference first (donation would invalidate reused state)
    tx1 = build_optimizer({"name": "sgd", "lr": 0.01, "momentum": 0.9},
                          None, 4, 2, jax.device_get(state.params), 0.0)
    step1 = make_train_step(model, loss_fn, tx1, mesh=None, donate=False)
    state_1, _ = step1(state, {k: jnp.asarray(v) for k, v in batch.items()})

    state_m = replicate(state, mesh)
    state_m, _ = step(state_m, shard_batch(batch, mesh))

    np.testing.assert_allclose(
        np.asarray(state_m.batch_stats["hash_bn"]["bn"]["mean"]),
        np.asarray(state_1.batch_stats["hash_bn"]["bn"]["mean"]),
        rtol=1e-4, atol=1e-5)


def test_cnn_batchnorm_stats_are_global(rng):
    """Same global-stats invariant for the CNN tower's 4D conv BatchNorm
    (models/resnet.py — the family imported from torchvision checkpoints):
    under the 8-device mesh the updated running stats must equal the
    single-device global-batch stats at every depth of the tower."""
    from concepthash_tpu.models.resnet import ResNet, ResNetConfig

    model = ResNet(ResNetConfig(18))

    def loss_fn(outputs, batch):
        return jnp.mean(outputs["features"] ** 2), {}

    sample = jnp.zeros((8, 16, 16, 3))
    variables = model.init(jax.random.PRNGKey(0), sample, train=False)
    tx = build_optimizer({"name": "sgd", "lr": 0.01}, None, 2, 2,
                         variables["params"], 1.0)
    state = create_train_state(model, tx, sample, jax.random.PRNGKey(0))
    batch = {"image": rng.standard_normal((8, 16, 16, 3)).astype(np.float32),
             "label": np.eye(4, dtype=np.float32)[rng.integers(0, 4, 8)],
             "index": np.arange(8, dtype=np.int32)}

    step1 = make_train_step(model, loss_fn, tx, mesh=None, donate=False)
    state_1, _ = step1(state, {k: jnp.asarray(v) for k, v in batch.items()})

    mesh = make_mesh()
    step_m = make_train_step(model, loss_fn, tx, mesh=mesh)
    state_m, _ = step_m(replicate(state, mesh), shard_batch(batch, mesh))

    for key in ("stem_bn", "stage3_block1"):
        a = jax.tree_util.tree_map(np.asarray, state_m.batch_stats[key])
        b = jax.tree_util.tree_map(np.asarray, state_1.batch_stats[key])
        jax.tree_util.tree_map(
            lambda x, y: np.testing.assert_allclose(x, y, rtol=1e-4,
                                                    atol=1e-5), a, b)


def test_eval_step_and_padding(rng):
    mesh = make_mesh()
    model, loss_fn, state, _ = build(mesh)
    eval_step = make_eval_step(model, loss_fn, mesh=mesh)
    batch = make_batch(rng, 5)  # not divisible by 8
    padded, n_real = pad_to_multiple(batch, 8)
    assert padded["image"].shape[0] == 8 and n_real == 5
    state = replicate(state, mesh)
    codes, metrics = eval_step(state, shard_batch(padded, mesh))
    assert codes["codes"].shape == (8, 16)
    assert "loss" in metrics and "acc_cont" in metrics


def test_param_labels():
    model, _, state, _ = build()
    labels = param_labels(jax.device_get(state.params))
    assert labels["backbone"]["layers_0"]["fc1"]["kernel"] == "backbone"
    assert labels["backbone"]["layers_0"]["adapter_mlp"]["up"]["kernel"] == "train"
    assert labels["hash_fc"]["kernel"] == "train"
    assert labels["hash_queries"] == "train"


def test_multi_step_matches_sequential(rng):
    """K scan-chunked steps must reproduce K sequential steps exactly: same
    params (same op order per step), same stacked metrics, same RNG stream
    (the step folds state.step into state.rng, and step advances inside the
    scan)."""
    from concepthash_tpu.parallel.mesh import shard_batch_chunk
    from concepthash_tpu.train.state import make_multi_train_step

    mesh = make_mesh()
    model, loss_fn, state0, _ = build(mesh)
    tx = build_optimizer({"name": "sgd", "lr": 0.01, "momentum": 0.9},
                         {"name": "csw", "warmup_epochs": 1},
                         epochs=4, steps_per_epoch=2,
                         params=jax.device_get(state0.params),
                         backbone_lr_scale=0.0)
    step = make_train_step(model, loss_fn, tx, mesh=mesh, donate=False)
    multi = make_multi_train_step(model, loss_fn, tx, mesh=mesh, donate=False)

    K = 4
    batches = [make_batch(rng) for _ in range(K)]

    state_seq = replicate(state0, mesh)
    seq_losses = []
    for b in batches:
        state_seq, m = step(state_seq, shard_batch(b, mesh))
        seq_losses.append(float(m["loss"]))

    stacked = {k: np.stack([b[k] for b in batches]) for k in batches[0]}
    state_scan = replicate(state0, mesh)
    state_scan, ms = multi(state_scan, shard_batch_chunk(stacked, mesh))

    assert int(state_scan.step) == K
    np.testing.assert_allclose(np.asarray(ms["loss"]), seq_losses, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(state_seq.params),
                    jax.tree_util.tree_leaves(state_scan.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_multi_eval_matches_sequential(rng):
    """Scan-chunked eval (encode path) returns the same codes/metrics as
    per-batch eval steps."""
    from concepthash_tpu.parallel.mesh import shard_batch_chunk
    from concepthash_tpu.train.state import make_multi_eval_step

    mesh = make_mesh()
    model, loss_fn, state, _ = build(mesh)
    state = replicate(state, mesh)
    eval_step = make_eval_step(model, loss_fn, mesh=mesh)
    multi = make_multi_eval_step(model, loss_fn, mesh=mesh)

    batches = [make_batch(rng) for _ in range(3)]
    singles = [eval_step(state, shard_batch(b, mesh)) for b in batches]
    stacked = {k: np.stack([b[k] for b in batches]) for k in batches[0]}
    codes_k, metrics_k = multi(state, shard_batch_chunk(stacked, mesh))

    for i, (codes, metrics) in enumerate(singles):
        for k in codes:
            np.testing.assert_allclose(np.asarray(codes_k[k])[i],
                                       np.asarray(codes[k]), rtol=1e-5,
                                       atol=1e-6)
        np.testing.assert_allclose(np.asarray(metrics_k["loss"])[i],
                                   np.asarray(metrics["loss"]), rtol=1e-5)


def test_meterbank_stacked_updates():
    """Stacked (K,) metrics with per-step counts average like K scalar
    updates (the scan-chunked loop path)."""
    from concepthash_tpu.utils.meters import MeterBank

    a, b = MeterBank(), MeterBank()
    vals, ns = [1.0, 2.0, 4.0], [8, 8, 3]
    for v, n in zip(vals, ns):
        a.update_device({"loss": np.asarray(v)}, n)
    b.update_device({"loss": np.asarray(vals)}, ns)
    assert a.materialize() == b.materialize()


def test_remat_matches_plain(rng):
    """remat=True must not change values — only the backward memory/FLOPs."""
    from concepthash_tpu.models.clip import ClipVisionConfig, ClipVisionTower

    base = dict(hidden_size=32, intermediate_size=64, num_layers=2,
                num_heads=4, image_size=16, patch_size=8, projection_dim=32)
    t0 = ClipVisionTower(ClipVisionConfig(**base))
    t1 = ClipVisionTower(ClipVisionConfig(**base, remat=True))
    img = jnp.asarray(rng.standard_normal((2, 16, 16, 3)), jnp.float32)
    params = t0.init(jax.random.PRNGKey(0), img)["params"]

    def loss(tower, p):
        return (tower.apply({"params": p}, img)["pooled"] ** 2).sum()

    v0, g0 = jax.value_and_grad(lambda p: loss(t0, p))(params)
    v1, g1 = jax.value_and_grad(lambda p: loss(t1, p))(params)
    assert float(v0) == pytest.approx(float(v1), rel=1e-6)
    a = jax.tree_util.tree_leaves(g0)
    b = jax.tree_util.tree_leaves(g1)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-5,
                                   atol=1e-6)
