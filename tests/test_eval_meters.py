"""Eval meters must include the variable last batch — the reference's
inference loop meters every batch including the short tail
(trainers/base.py:275-307); padded rows must never bias test_loss (the
GeneralExperiment 'best' criterion)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from concepthash_tpu.data.manifest import HashingDataset
from concepthash_tpu.data.pipeline import Loader
from concepthash_tpu.data.synthetic import make_synthetic_dataset
from concepthash_tpu.experiments.hashing import RetrievalExperiment
from concepthash_tpu.losses.concepthash import lgh_loss
from concepthash_tpu.models.clip import AdapterConfig, ClipVisionConfig
from concepthash_tpu.models.concepthash import ConceptHash, ConceptHashConfig
from concepthash_tpu.parallel.mesh import make_mesh, replicate
from concepthash_tpu.train.optim import build_optimizer
from concepthash_tpu.train.state import create_train_state, make_eval_step


@pytest.fixture(scope="module")
def exp(tmp_path_factory):
    root = tmp_path_factory.mktemp("tail")
    make_synthetic_dataset(str(root), nclass=3, per_class_train=4,
                           per_class_test=2, image_size=16)
    ds = HashingDataset(str(root), "train.txt", num_classes=3)
    assert len(ds) == 12  # bs=8 -> one full batch + tail of 4

    vcfg = ClipVisionConfig(hidden_size=32, intermediate_size=64, num_layers=2,
                            num_heads=4, image_size=16, patch_size=8,
                            projection_dim=32)
    ccfg = ConceptHashConfig(nbit=16, nclass=3, ncontext=4, num_heads=4,
                             center_dim=32, text_projection_dims=(32,))
    center = np.random.default_rng(0).standard_normal((3, 32)).astype(np.float32)
    model = ConceptHash(vcfg, ccfg, adapters=AdapterConfig(bottleneck_dim=8),
                        fixed_center=jnp.asarray(center))

    def loss_fn(outputs, batch):
        return lgh_loss(outputs, batch["label"], ncontext=4)

    sample = jnp.zeros((8, 16, 16, 3))
    params = model.init({"params": jax.random.PRNGKey(0),
                         "dropout": jax.random.PRNGKey(1)},
                        sample, train=True)["params"]
    tx = build_optimizer({"name": "sgd", "lr": 0.01}, {"name": "no_decay"},
                         epochs=1, steps_per_epoch=1, params=params)
    mesh = make_mesh()

    def pp(images, _rng):
        return images.astype(jnp.float32) / 255.0

    e = RetrievalExperiment.__new__(RetrievalExperiment)
    e.config = {"batch_size": 8}
    e.mesh = mesh
    e.loaders = {"test": Loader(ds, 8, resize=16)}
    e.state = replicate(create_train_state(model, tx, sample,
                                           jax.random.PRNGKey(0)), mesh)
    e.eval_step = make_eval_step(model, loss_fn, mesh=mesh, preprocess_fn=pp)
    return e


def test_tail_batch_in_meters(exp):
    codes, labels, meters = exp.encode_split("test")
    assert codes["codes"].shape == (12, 16)
    assert labels.shape == (12, 3)
    assert "loss" in meters and np.isfinite(meters["loss"])

    # expected: weighted mean of the full batch's loss and the tail's loss
    # computed over exactly the 4 valid rows
    batches = list(exp.loaders["test"])
    full = {k: v for k, v in batches[0].items() if k != "n_valid"}
    tail = {k: v[:4] for k, v in batches[1].items() if k != "n_valid"}
    _, m_full = exp.eval_step(exp.state, full)
    _, m_tail = exp.eval_step(exp.state, tail)
    expected = (float(m_full["loss"]) * 8 + float(m_tail["loss"]) * 4) / 12
    assert meters["loss"] == pytest.approx(expected, rel=1e-5)
    # padded zero-rows would have shifted the loss: recompute with padding
    padded = {k: v for k, v in batches[1].items() if k != "n_valid"}
    _, m_padded = exp.eval_step(exp.state, padded)
    biased = (float(m_full["loss"]) * 8 + float(m_padded["loss"]) * 8) / 16
    assert abs(meters["loss"] - biased) > 1e-6  # the bias the fix removes


def test_restore_partial_keeps_fresh_on_mismatch():
    """finetune_init's lenient restore (hashing._restore_partial): matching
    leaves load, shape-mismatched or missing leaves keep the template
    (reference finetune_reset semantics — a head re-targeted to a new nclass
    is freshly initialized)."""
    import jax.numpy as jnp
    import numpy as np

    from concepthash_tpu.experiments.hashing import _restore_partial

    template = {"backbone": {"w": jnp.zeros((4, 4))},
                "head": {"w": jnp.zeros((4, 8)), "b": jnp.zeros((8,))},
                "extra": jnp.zeros((2,))}
    blob = {"backbone": {"w": np.ones((4, 4))},
            "head": {"w": np.ones((8, 4)),     # SAME numel, transposed —
                     "b": np.ones((6,))}}      # must NOT load scrambled
    out, n_ok, n_skip = _restore_partial(template, blob)
    np.testing.assert_array_equal(np.asarray(out["backbone"]["w"]),
                                  np.ones((4, 4)))
    # mismatched head + missing 'extra' keep the fresh template values
    np.testing.assert_array_equal(np.asarray(out["head"]["w"]),
                                  np.zeros((4, 8)))
    np.testing.assert_array_equal(np.asarray(out["extra"]), np.zeros((2,)))
    assert n_ok == 1 and n_skip == 3


def test_restore_like_raises_on_shape_mismatch():
    """STRICT resume (hashing._restore_like): a same-numel transposed leaf —
    the footprint of an architecture tweak between save and resume — must
    raise, never blind-reshape into scrambled weights (VERDICT r4 weak-4)."""
    import jax.numpy as jnp
    import numpy as np
    import pytest

    from concepthash_tpu.experiments.hashing import _restore_like

    template = {"head": {"w": jnp.zeros((4, 8))}}
    good = {"head": {"w": np.ones((4, 8))}}
    out = _restore_like(template, good)
    np.testing.assert_array_equal(np.asarray(out["head"]["w"]),
                                  np.ones((4, 8)))
    bad = {"head": {"w": np.ones((8, 4))}}  # same numel, transposed
    with pytest.raises(ValueError, match="strict resume"):
        _restore_like(template, bad)
