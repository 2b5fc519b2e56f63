"""Test configuration.

Tests run on a virtual 8-device CPU mesh (multi-chip sharding is validated
without TPU hardware, per the driver's dryrun contract) with x64 enabled so
host-exact f64 semantics can be checked end to end.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# jax may already be registered against a TPU plugin by a sitecustomize hook;
# the config update below still wins as long as no backend was initialised.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_TEST_DATA = "/root/reference/pasture-io/resources/test"


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture
def reference_test_data():
    return REFERENCE_TEST_DATA
