"""Importing the package must not touch any jax backend.

Round-1 regression: a module-level ``jnp.asarray`` in ops/roi.py eagerly
dispatched on the default (TPU) backend at import time, so a libtpu env flake
failed the driver's CPU-only multichip dryrun. The invariant pinned here:
importing every module in the package initializes zero jax backends and
creates zero device arrays.

Runs in a fresh subprocess because the test process itself already has a live
backend.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHECK = r"""
import importlib
import pkgutil

import silent_speech_tpu

mods = ["silent_speech_tpu"]
for m in pkgutil.walk_packages(silent_speech_tpu.__path__,
                               prefix="silent_speech_tpu."):
    mods.append(m.name)
for name in mods:
    importlib.import_module(name)

import jax._src.xla_bridge as xb
assert not xb._backends, (
    "package import initialized jax backend(s): %r" % sorted(xb._backends)
)
print("import-hygiene ok: %d modules, 0 backends" % len(mods))
"""


def test_package_import_initializes_no_backend():
    env = dict(os.environ)
    # simulate the bench host: default platform present but NOT cpu-pinned;
    # the import must succeed without ever initializing it
    env.pop("JAX_PLATFORMS", None)
    proc = subprocess.run(
        [sys.executable, "-c", _CHECK],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, (
        f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    )
    assert "import-hygiene ok" in proc.stdout


def test_dryrun_multichip_survives_poisoned_default_backend():
    """dryrun_multichip must pass even when the default platform is broken.

    Simulated by pointing JAX at a nonexistent platform via PJRT plugin
    confusion is not possible portably; instead we assert the other half of
    the contract — the dryrun passes with NO host-device-count flag set in
    the parent (it must self-heal via its CPU subprocess path).
    """
    env = dict(os.environ)
    flags = env.get("XLA_FLAGS", "")
    env["XLA_FLAGS"] = " ".join(
        f for f in flags.split()
        if not f.startswith("--xla_force_host_platform_device_count")
    )
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, (
        f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    )
    assert "dryrun_multichip(8)" in proc.stdout
