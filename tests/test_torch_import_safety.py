"""Importer safety hardening (ADVICE r4).

- ``load_state_dict`` defaults to ``torch.load(weights_only=True)``: a
  ``.pth`` from an untrusted source must not execute pickle payloads.
  Reference checkpoints are plain tensor state_dicts (reference
  trainers/base.py:190-193) and load fine under the restricted unpickler;
  anything else raises unless the caller explicitly opts into ``unsafe``.
- ``_graft`` surfaces expected-but-missing patch leaves in
  ``report.missing`` instead of silently leaving them at random init.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def test_load_state_dict_plain_tensors(tmp_path):
    from concepthash_tpu.utils.torch_import import load_state_dict

    path = str(tmp_path / "ok.pth")
    torch.save({"w": torch.ones(2, 3), "b": torch.zeros(3)}, path)
    sd = load_state_dict(path)
    np.testing.assert_array_equal(sd["w"], np.ones((2, 3), np.float32))


def test_load_state_dict_rejects_pickle_payload(tmp_path):
    """A blob the restricted unpickler can't load raises by default and
    only loads behind the explicit unsafe flag."""
    from concepthash_tpu.utils.torch_import import load_state_dict

    path = str(tmp_path / "sus.pth")
    # a function reference is pickle-loadable but outside the
    # weights_only=True allowlist — stands in for an arbitrary payload
    torch.save({"state_dict": {"w": torch.ones(2)}, "fn": np.random.default_rng},
               path)
    with pytest.raises(RuntimeError, match="--unsafe"):
        load_state_dict(path)
    sd = load_state_dict(path, unsafe=True)
    np.testing.assert_array_equal(sd["w"], np.ones(2, np.float32))


def test_graft_reports_missing_expected_leaf():
    """A patch entry that resolved to None (e.g. _take2 miss on a required
    head leaf) is recorded in report.missing; present leaves still graft."""
    from concepthash_tpu.utils.torch_import import ImportReport, _graft

    report = ImportReport({})
    dst = {"head": {"w": np.zeros((2, 2)), "q": np.zeros((3,))}}
    patch = {"head": {"w": np.ones((2, 2)), "q": None}}
    _graft(dst, patch, (), report)
    np.testing.assert_array_equal(dst["head"]["w"], np.ones((2, 2)))
    np.testing.assert_array_equal(dst["head"]["q"], np.zeros((3,)))  # kept
    assert report.missing == ["head/q"]
    assert report.written == ["head/w"]
