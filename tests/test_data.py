"""Data layer: manifests, loader batching/padding, fused device preprocessing
(golden parity vs PIL/torch where semantics are shared)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from concepthash_tpu.data.manifest import HashingDataset, OneHot, read_class_names
from concepthash_tpu.data.pipeline import Loader, dataloader
from concepthash_tpu.data.preprocess import (
    center_crop,
    load_image_host,
    normalize,
    preprocess_batch,
)
from concepthash_tpu.data.synthetic import make_synthetic_dataset


@pytest.fixture(scope="module")
def ds_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth")
    return make_synthetic_dataset(str(root), nclass=3, per_class_train=4,
                                  per_class_test=2, image_size=64)


def test_manifest_and_class_names(ds_root):
    ds = HashingDataset(ds_root, "train.txt", num_classes=3)
    assert len(ds) == 12
    assert ds.onehot_labels().shape == (12, 3)
    assert ds.onehot_labels().sum() == 12
    names = read_class_names(ds_root)
    assert names == ["synthetic class 0", "synthetic class 1", "synthetic class 2"]
    sub = ds.subset([0, 5])
    assert len(sub) == 2


def test_few_shot(ds_root):
    ds = HashingDataset(ds_root, "train.txt", num_classes=3, num_shots=2)
    assert len(ds) == 6
    assert (np.bincount(ds.labels) == 2).all()


def test_onehot_transform():
    oh = OneHot(5)
    np.testing.assert_array_equal(oh(3), np.eye(5, dtype=np.float32)[3])


def test_loader_batching_and_padding(ds_root):
    ds = HashingDataset(ds_root, "train.txt", num_classes=3)
    loader = Loader(ds, batch_size=5, resize=48, shuffle=True, seed=7)
    batches = list(loader)
    assert len(batches) == 3  # ceil(12/5)
    for b in batches:
        assert b["image"].shape == (5, 48, 48, 3)
        assert b["image"].dtype == np.uint8
        assert b["label"].shape == (5, 3)
    assert batches[-1]["n_valid"] == 2
    assert (batches[-1]["index"][2:] == -1).all()
    # shuffle differs across epochs, deterministic per seed
    order1 = np.concatenate([b["index"] for b in loader])
    loader2 = Loader(ds, batch_size=5, resize=48, shuffle=True, seed=7)
    order2 = np.concatenate([b["index"] for b in loader2])
    assert not np.array_equal(order1[:12], order2[:12])


def test_loader_drop_last(ds_root):
    ds = HashingDataset(ds_root, "train.txt", num_classes=3)
    loader = dataloader(ds, 5, shuffle=True, drop_last=True, resize=48)
    assert len(list(loader)) == 2


def test_host_decode_matches_pil_torch_resize(ds_root):
    """Host short-side-resize + center-crop equals torchvision's
    Resize(resize)+CenterCrop(resize) (both PIL bicubic)."""
    torch = pytest.importorskip("torch")
    from PIL import Image

    ds = HashingDataset(ds_root, "test.txt", num_classes=3)
    path = ds.image_path(0)
    ours = load_image_host(path, resize=48)

    with Image.open(path) as im:
        im = im.convert("RGB")
        w, h = im.size
        short = min(w, h)
        nw, nh = round(w * 48 / short), round(h * 48 / short)
        ref = im.resize((max(nw, 48), max(nh, 48)), Image.BICUBIC)
        left, top = (ref.size[0] - 48) // 2, (ref.size[1] - 48) // 2
        ref = np.asarray(ref.crop((left, top, left + 48, top + 48)))
    np.testing.assert_array_equal(ours, ref)


def test_normalize_stats():
    x = jnp.full((1, 4, 4, 3), 255, jnp.uint8)
    out = np.asarray(normalize(x, norm=3))
    expected = (1.0 - np.array([0.48145466, 0.4578275, 0.40821073])) / \
        np.array([0.26862954, 0.26130258, 0.27577711])
    np.testing.assert_allclose(out[0, 0, 0], expected, rtol=1e-5)


def test_preprocess_eval_center_crop():
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (2, 32, 32, 3)).astype(np.uint8)
    out = preprocess_batch(jnp.asarray(imgs), jax.random.PRNGKey(0), crop=24,
                           norm=0, train=False)
    ref = normalize(center_crop(jnp.asarray(imgs).astype(jnp.float32), 24), 0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    assert out.shape == (2, 24, 24, 3)


@pytest.mark.parametrize("augment", ["rrc", "randcrop", "trivial"])
def test_preprocess_train_modes(augment):
    rng = np.random.default_rng(1)
    imgs = rng.integers(0, 256, (4, 32, 32, 3)).astype(np.uint8)
    out = preprocess_batch(jnp.asarray(imgs), jax.random.PRNGKey(1), crop=24,
                           norm=2, train=True, augment=augment)
    assert out.shape == (4, 24, 24, 3)
    assert np.isfinite(np.asarray(out)).all()
    # different rng -> different augmentation
    out2 = preprocess_batch(jnp.asarray(imgs), jax.random.PRNGKey(2), crop=24,
                            norm=2, train=True, augment=augment)
    assert not np.allclose(np.asarray(out), np.asarray(out2))


def test_trivial_augment_ops_all_run():
    from concepthash_tpu.data.augment import _OPS, _augment_one

    rng = np.random.default_rng(2)
    im = jnp.asarray(rng.uniform(0, 255, (16, 16, 3)).astype(np.float32))
    for i in range(len(_OPS)):
        out = _augment_one(im, jnp.int32(i), jnp.float32(0.5))
        assert out.shape == im.shape
        assert np.isfinite(np.asarray(out)).all(), f"op {i} produced non-finite"
        assert float(np.asarray(out).max()) <= 255.0 + 1e-3


def test_trivial_augment_negative_magnitude_not_destructive():
    """Regression: the batch sampler flips magnitude signs for every op;
    posterize once wrapped (8 - bits) to uint8 255 on negative m and
    produced all-black images (~3.6% of trivialaugment batches)."""
    from concepthash_tpu.data.augment import _OPS, _augment_one

    rng = np.random.default_rng(3)
    im = jnp.asarray(rng.uniform(64, 255, (16, 16, 3)).astype(np.float32))
    for i in range(len(_OPS)):
        out = np.asarray(_augment_one(im, jnp.int32(i), jnp.float32(-0.5)))
        assert np.isfinite(out).all(), f"op {i} non-finite at m=-0.5"
        assert out.max() > 1.0, f"op {i} blacked out the image at m=-0.5"


def test_multihost_input_sharding(ds_root):
    """Per-host manifest sharding (SURVEY.md §5.8, pipeline.py process_index
    slicing): 4 simulated hosts must cover the dataset exactly once, with
    disjoint shards, regardless of shuffling."""
    ds = HashingDataset(ds_root, "train.txt", num_classes=3)
    n = len(ds)
    shards = []
    for pi in range(4):
        loader = Loader(ds, batch_size=4, resize=48, shuffle=True, seed=7,
                        process_index=pi, process_count=4)
        idxs = np.concatenate([b["index"][:b["n_valid"]] for b in loader])
        shards.append(set(int(i) for i in idxs))
        # every index the shard yields is a real dataset row
        assert all(0 <= i < n for i in shards[-1])
    # disjoint
    for a in range(4):
        for b in range(a + 1, 4):
            assert not (shards[a] & shards[b]), (a, b)
    # complete coverage
    assert set().union(*shards) == set(range(n))
    # shard sizes balanced to within one item
    sizes = sorted(len(s) for s in shards)
    assert sizes[-1] - sizes[0] <= 1


def test_per_host_shards_have_equal_batch_counts(ds_root):
    """SPMD requirement (round-4 review finding): every host must see the
    same number of batches or collectives deadlock. Eval shards pad with
    trailing -1 sentinels (coverage exact); train shards truncate."""
    ds = HashingDataset(ds_root, "train.txt", 3)
    n, pc, bs = len(ds), 4, 4
    for drop_last in (False, True):
        loaders = [Loader(ds, bs, shuffle=drop_last, drop_last=drop_last,
                          process_index=pi, process_count=pc)
                   for pi in range(pc)]
        counts = {len(ld) for ld in loaders}
        assert len(counts) == 1, (drop_last, counts)
        seen = []
        for ld in loaders:
            for batch in ld:
                idx = batch["index"][:batch["n_valid"]]
                assert (idx >= 0).all()
                seen.extend(idx.tolist())
        if not drop_last:   # eval: exact disjoint coverage despite padding
            assert sorted(seen) == list(range(n))


def test_loader_early_break_reaps_producer(ds_root):
    """Abandoning iteration mid-epoch must not strand the prefetch thread
    in a blocking q.put (round-4 review finding)."""
    import threading

    ds = HashingDataset(ds_root, "train.txt", 3)
    before = threading.active_count()
    for _ in range(5):
        it = iter(Loader(ds, 2, prefetch=2))
        next(it)
        it.close()          # triggers the generator's finally
    # reaped producers: thread count must not grow with abandoned epochs
    assert threading.active_count() <= before + 1


def test_prefetch_zero_is_synchronous(ds_root):
    ds = HashingDataset(ds_root, "train.txt", 3)
    batches = list(Loader(ds, 2, prefetch=0))
    assert len(batches) == -(-len(ds) // 2)


def test_multihot_manifest_nclass_and_commas(tmp_path):
    """Multi-hot manifests: num_classes = row width (not max+1), and
    comma-separated labels parse (the format the parser's comment
    advertises)."""
    root = tmp_path / "mh"
    (root / "images").mkdir(parents=True)
    with open(root / "train.txt", "w") as f:
        f.write("images/a.jpg 1,0,1,0\n")
        f.write("images/b.jpg 0 1 0 1\n")
    ds = HashingDataset(str(root), "train.txt")
    assert ds.num_classes == 4
    np.testing.assert_array_equal(ds.labels,
                                  [[1, 0, 1, 0], [0, 1, 0, 1]])
    with open(root / "bad.txt", "w") as f:
        f.write("images/a.jpg 1 0\n")
        f.write("images/b.jpg 1 0 1\n")
    with pytest.raises(ValueError, match="inconsistent label counts"):
        HashingDataset(str(root), "bad.txt")
