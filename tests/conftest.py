"""Test harness: force an 8-device virtual CPU mesh so sharded code paths
(pjit training, sharded-gallery retrieval) are exercised without a TPU slice
(SURVEY.md §4 rebuild note). Must run before jax is imported anywhere."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the session env may point at TPU
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# The container's sitecustomize imports jax at interpreter start (to register
# the axon TPU plugin), which freezes JAX_PLATFORMS from the outer env into
# jax's config before this file runs — so the env var alone is NOT enough:
# update the live config too, before any backend is initialized.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.default_backend() == "cpu", "tests must run on the virtual CPU mesh"
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices (XLA_FLAGS)"


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture(scope="session")
def jax_devices():
    import jax

    return jax.devices()
