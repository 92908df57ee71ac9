"""Test configuration: CPU backend with 8 virtual devices + float64.

Mirrors the reference's test strategy of running everything on tiny synthetic
data with no special hardware (SURVEY.md §4): distributed logic is exercised
on a virtual 8-device CPU mesh, numerics at float64 for parity with the
reference's double-precision Eigen results.
"""

import os

# Force CPU: the session environment pins JAX_PLATFORMS to the tunneled TPU
# (axon), which is reserved for benchmarks; tests run on a virtual 8-device
# CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(2012)
