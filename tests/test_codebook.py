"""Codebook stage: the ae binarizer family (reference
trainers/orthohash.py:164-252) and the user-provided 'file' method."""

import numpy as np
import pytest

from concepthash_tpu.train.codebook import ae_fit, get_codebook


@pytest.fixture(scope="module")
def emb():
    return np.random.default_rng(0).standard_normal((8, 24)).astype(np.float32)


@pytest.mark.parametrize("method", ["ae", "nonae", "ae_cossim",
                                    "ae_norm_cossim", "induced_ae_cossim"])
def test_ae_variants_shape_and_finite(emb, method):
    out = ae_fit(emb, 16, method=method, iters=50)
    assert out.shape == (8, 16)
    assert np.isfinite(out).all()


def test_ae_training_improves_identity_objective(emb):
    """Plain 'ae' targets an orthogonal code gram; more iters must shrink the
    identity gap (similarity-preservation term actually trains)."""

    def gap(iters):
        b = np.sign(ae_fit(emb, 16, method="ae", iters=iters))
        return np.abs(np.eye(8) - (b @ b.T) / 16).mean()

    assert gap(400) < gap(1)


def test_codebook_L_with_ae_binarizer(emb):
    cb = get_codebook("L", nclass=8, nbit=16,
                      class_names=[f"c{i}" for i in range(8)],
                      binary_method="ae", ae_iters=50,
                      text_embedder=lambda names: emb)
    assert cb.shape == (8, 16)
    assert set(np.unique(cb)) <= {-1.0, 1.0}


def test_codebook_from_file(tmp_path, emb):
    p = str(tmp_path / "cb.npy")
    np.save(p, emb[:, :16])
    signed = get_codebook("file", nclass=8, nbit=16, path=p)
    np.testing.assert_array_equal(signed, np.sign(emb[:, :16]))
    raw = get_codebook("file", nclass=8, nbit=16, path=p, quantized=False)
    np.testing.assert_array_equal(raw, emb[:, :16])
