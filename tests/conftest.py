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
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# Collective rendezvous on virtual CPU devices hard-aborts the process
# (F-level check) if the 8 device threads don't all reach a collective
# within 40s — observed on a loaded single-core host. Raise the timeouts:
# correctness tests don't care about collective latency.
if "collective" not in flags:
    flags += (
        " --xla_cpu_collective_timeout_seconds=600"
        " --xla_cpu_collective_call_warn_stuck_timeout_seconds=300"
        " --xla_cpu_collective_call_terminate_timeout_seconds=600"
    )
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
