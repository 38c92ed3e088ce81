"""Test substrate: run all tests on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; the standard JAX stand-in is
``--xla_force_host_platform_device_count`` (SURVEY.md section 4d). These env
vars must be set before jax initializes its backends, hence module scope.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_collective_call_terminate_timeout_seconds" not in _flags:
    # 8 virtual devices share one physical core: XLA-CPU's collective
    # rendezvous aborts the process if a participant thread is starved
    # past 40 s (observed once under load). Tests care about completing.
    _flags += (
        " --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
        " --xla_cpu_collective_call_terminate_timeout_seconds=1200 --xla_cpu_collective_timeout_seconds=1200"
    )
os.environ["XLA_FLAGS"] = _flags

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
