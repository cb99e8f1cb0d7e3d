"""Multi-label path: manifest lines with several labels -> multi-hot targets,
multiclass losses, and multilabel retrieval relevance (any shared label)."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from concepthash_tpu.data.manifest import HashingDataset
from concepthash_tpu.losses.baselines import csq_loss, orthohash_loss
from concepthash_tpu.ops.retrieval import calculate_mAP


@pytest.fixture
def multilabel_ds(tmp_path):
    from PIL import Image

    root = str(tmp_path)
    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    rng = np.random.default_rng(0)
    lines = []
    for i in range(6):
        arr = rng.integers(0, 255, (32, 32, 3)).astype(np.uint8)
        fn = f"images/{i}.png"
        Image.fromarray(arr).save(os.path.join(root, fn))
        labels = " ".join(str(x) for x in sorted(
            rng.choice(4, size=rng.integers(1, 3), replace=False)))
        lines.append(f"{fn} {labels}")
    # multilabel manifests: multi-hot row per line (0/1 per class)
    hot = np.zeros((6, 4), np.int64)
    for i, line in enumerate(lines):
        for lab in line.split()[1:]:
            hot[i, int(lab)] = 1
    with open(os.path.join(root, "train.txt"), "w") as f:
        for i, line in enumerate(lines):
            f.write(lines[i].split()[0] + " " +
                    " ".join(str(v) for v in hot[i]) + "\n")
    return root, hot


def test_multilabel_manifest(multilabel_ds):
    root, hot = multilabel_ds
    ds = HashingDataset(root, "train.txt", num_classes=4)
    assert ds.labels.shape == (6, 4)
    np.testing.assert_array_equal(ds.onehot_labels(), hot.astype(np.float32))


def test_multiclass_losses_finite(rng, multilabel_ds):
    _, hot = multilabel_ds
    y = jnp.asarray(hot.astype(np.float32))
    codes = jnp.asarray(rng.standard_normal((6, 16)), jnp.float32)
    logits = jnp.asarray(rng.uniform(-1, 1, (6, 4)), jnp.float32)
    cb = jnp.asarray(np.sign(rng.standard_normal((4, 16))), jnp.float32)
    for mcl in ("bce", "label_smoothing", "label_smoothing_unscaled"):
        total, _ = orthohash_loss({"logits": logits, "codes": codes}, y,
                                  multiclass=True, multiclass_loss=mcl, quan=0.1)
        assert np.isfinite(float(total)), mcl
    total, _ = csq_loss({"codes": codes}, y, codebook=cb, multiclass=True)
    assert np.isfinite(float(total))


def test_multilabel_retrieval_relevance(rng, multilabel_ds):
    """Relevance = any shared label; an item sharing one of two labels is a
    positive (reference imatch semantics, SURVEY.md §2.6)."""
    db_labels = np.array([[1, 1, 0, 0], [0, 0, 1, 1], [1, 0, 0, 0]], np.float32)
    q_labels = np.array([[1, 0, 0, 0]], np.float32)
    # query code nearest to db[1] (non-relevant), then db[0], db[2] (relevant)
    db = np.array([[1, 1, 1, 1], [1, 1, 1, -1], [1, 1, -1, -1]], np.float32)
    q = np.array([[1, 1, 1, -1]], np.float32)
    mAP, recalls, precisions = calculate_mAP(db, db_labels, q, q_labels,
                                             R=-1, PRs=(1,))
    # ranking: db1 (d=0, not rel), db0 (d=1, rel), db2 (d=1, rel, later index)
    # AP = (1/2 + 2/3) / 2
    assert mAP == pytest.approx((1 / 2 + 2 / 3) / 2, abs=1e-6)
    assert precisions[0] == 0.0  # top-1 is the non-relevant item
