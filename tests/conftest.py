"""Test substrate: run all tests on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; the standard JAX stand-in is
``--xla_force_host_platform_device_count`` (SURVEY.md section 4d). These env
vars must be set before jax initializes its backends, hence module scope.
"""

import os

# device-count + collective-timeout flag set shared with the driver's
# multichip dryrun (importing __graft_entry__ does not initialize any jax
# backend, so setting the env here is still "before jax initializes")
from __graft_entry__ import _cpu_mesh_xla_flags  # noqa: E402

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = _cpu_mesh_xla_flags(
    os.environ.get("XLA_FLAGS", ""), 8
)

import jax  # noqa: E402

# The axon TPU plugin self-registers via sitecustomize and overrides
# JAX_PLATFORMS; the config update below wins over both. Tests also pin
# matmul precision to float32 — parity assertions would otherwise see
# bf16 MXU rounding when a TPU is attached.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng() -> np.random.Generator:
    return np.random.default_rng(42)
