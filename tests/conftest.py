"""Test configuration.

The interpreter may boot with a TPU backend pre-registered (sitecustomize),
so JAX_PLATFORMS cannot simply be overridden here. Instead the default device
is pointed at the host CPU platform, with 8 virtual CPU devices requested
*before* the lazy CPU client is created (XLA_FLAGS). This gives:

- exact float32 math for the torch-parity tests (TPU default bf16 matmuls
  would blow the 1e-3 tolerance, and forcing 'highest' precision makes the
  remote TPU compiler pathologically slow);
- fast local compiles for the many small test programs;
- an 8-device mesh for multi-chip sharding tests — the standard way to test
  pjit layouts without a TPU pod.

TPU-backend smoke tests opt in via the ``tpu`` marker and explicit
device_put; run them with ``pytest -m tpu``.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

_CPU0 = jax.devices("cpu")[0]
jax.config.update("jax_default_device", _CPU0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line("markers", "tpu: requires the real TPU backend")


def pytest_collection_modifyitems(config, items):
    if config.getoption("-m"):
        return
    try:
        jax.devices("tpu")
        have_tpu = True
    except RuntimeError:
        have_tpu = False
    if have_tpu:
        return
    skip = pytest.mark.skip(reason="no TPU backend available")
    for item in items:
        if "tpu" in item.keywords:
            item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture(scope="session")
def cpu_mesh_devices():
    """8 virtual CPU devices for multi-chip sharding tests."""
    devs = jax.devices("cpu")
    assert len(devs) >= 8, "expected 8 virtual CPU devices (XLA_FLAGS)"
    return devs[:8]
