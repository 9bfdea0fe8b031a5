"""Test configuration: force an 8-device virtual CPU mesh so multi-chip
sharding logic is exercised without TPU hardware (SURVEY §4)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the shell may export axon (TPU)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The image's sitecustomize registers the axon (TPU tunnel) backend and
# pins jax_platforms to "axon,cpu"; tests must run on the virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")

import sys  # noqa: E402

sys.path.insert(0, os.path.dirname(__file__))  # oracle/synthdata helpers

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


def make_genome(rng, length=20000, seed=7):
    """Deterministic random genome sequence."""
    r = np.random.default_rng(seed)
    return "".join(r.choice(list("ACGT"), size=length))


@pytest.fixture
def genome():
    return make_genome(None)
