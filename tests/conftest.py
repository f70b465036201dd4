"""Test configuration.

Notes on the execution environment:
- The interpreter may boot with a TPU backend pre-registered (sitecustomize),
  so JAX_PLATFORMS cannot be overridden here. Instead we (a) force float32
  matmul precision globally so parity tests aren't wrecked by the TPU's
  default bf16 MXU passes, and (b) request 8 virtual CPU host devices via
  XLA_FLAGS *before* the lazy CPU client is created — multi-chip sharding
  tests then build their mesh from ``jax.devices("cpu")``, the standard way
  to test pjit layouts without a TPU pod.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture(scope="session")
def cpu_mesh_devices():
    """8 virtual CPU devices for multi-chip sharding tests."""
    devs = jax.devices("cpu")
    assert len(devs) >= 8, "expected 8 virtual CPU devices (XLA_FLAGS)"
    return devs[:8]
