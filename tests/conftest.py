"""Test configuration: force an 8-device CPU platform for the whole suite.

Multi-device sharding tests run on virtual CPU devices
(xla_force_host_platform_device_count), the TPU-world answer to "test
multi-node without a cluster" (SURVEY.md §4). Must run before jax imports.
"""

import os

# Force-override: the ambient environment may point JAX at a live TPU
# ('axon' plugin, registered via sitecustomize); the test suite always runs
# on the virtual 8-device CPU platform. The env var alone is not enough —
# the plugin wins unless jax_platforms is set through the config API.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
