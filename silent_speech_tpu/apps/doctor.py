"""Environment diagnosis: everything the pipeline needs, checked in one go.

The reference's closest artifact is debug.py (dataset-dir typo diagnosis);
a production deployment needs the whole stack checked: JAX backend/devices,
the native C++ components (npz loader, ring buffer), the host capture deps
(cv2/mediapipe/landmarker asset), checkpoint backends, and a tiny end-to-end
jit smoke. Each line is PASS/WARN/FAIL with an actionable message; exit code
is 1 only on FAILs (WARNs cover optional host-capture extras).
"""

from __future__ import annotations

import importlib
import os


def _line(status: str, name: str, detail: str) -> None:
    print(f"  [{status:^4s}] {name:<22s} {detail}")


def _probe_backend(timeout_s: float):
    """Backend init in a BOUNDED subprocess. A wedged device relay makes
    jax.devices() hang in-process forever (retry loop inside the PJRT
    plugin, observed round 3) — the doctor must diagnose that state, not
    reproduce it. Returns None on timeout, ('error', msg) on a failed init,
    ('ok', info) on success (after which the in-process import is safe)."""
    import subprocess
    import sys

    code = ("import jax; d = jax.devices(); "
            "print(jax.__version__, jax.default_backend(), len(d), "
            "d[0].platform)")
    try:
        r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                           text=True, timeout=timeout_s)
    except subprocess.TimeoutExpired:
        return None
    if r.returncode != 0:
        tail = r.stderr.strip().splitlines()[-1] if r.stderr.strip() else "?"
        return ("error", tail)
    return ("ok", r.stdout.strip())


def run_doctor() -> int:
    fails = 0
    jax = None

    # --- jax / backend ---------------------------------------------------
    timeout_s = float(os.environ.get("SILENT_SPEECH_DOCTOR_TIMEOUT", "90"))
    probe = _probe_backend(timeout_s)
    if probe is None:
        _line("FAIL", "jax",
              f"backend init timed out after {timeout_s:.0f}s — a remote "
              "device relay is unreachable/wedged. Host-only workaround: "
              "set JAX_PLATFORMS=cpu and drop the device-plugin entry from "
              "PYTHONPATH (so its sitecustomize does not register the dead "
              "backend)")
        fails += 1
    elif probe[0] == "error":
        _line("FAIL", "jax", probe[1])
        fails += 1
    else:
        import jax

        backend = jax.default_backend()
        devs = jax.devices()
        _line("PASS", "jax", f"{jax.__version__} backend={backend} "
                             f"devices={len(devs)} ({devs[0].platform})")
        if backend not in ("tpu", "cpu"):
            _line("WARN", "backend", f"unexpected backend {backend!r}")

    # --- jit smoke (compile + execute one small program) ------------------
    if jax is not None:
        try:
            import jax.numpy as jnp

            out = jax.jit(lambda a: (a @ a.T).sum())(jnp.ones((64, 64)))
            assert float(out) == 64.0 * 64 * 64
            _line("PASS", "jit smoke", "64x64 matmul compiled + executed")
        except Exception as e:  # noqa: BLE001
            _line("FAIL", "jit smoke", f"{type(e).__name__}: {e}")
            fails += 1

    # --- native components -------------------------------------------------
    from ..runtime import native

    try:
        lib = native.load()
        if lib is None:
            _line("WARN", "native npz loader",
                  "unavailable (g++ build failed?) — pure-python fallback "
                  "active, corpus loads will be slower")
        else:
            _line("PASS", "native npz loader", "csrc/npz_loader.cpp loaded")
    except Exception as e:  # noqa: BLE001
        _line("WARN", "native npz loader", f"{type(e).__name__}: {e}")

    try:
        import numpy as np

        from ..runtime.ringbuf import FrameRing

        rb = FrameRing(4, 64)
        rb.push(np.zeros(64, np.uint8))
        assert rb.pop() is not None
        _line("PASS", "native ring buffer", "push/pop ok")
    except Exception as e:  # noqa: BLE001
        _line("WARN", "native ring buffer", f"{type(e).__name__}: {e}")

    # --- checkpoint backends ----------------------------------------------
    try:
        importlib.import_module("orbax.checkpoint")
        _line("PASS", "orbax", "available (checkpoint_format=orbax usable)")
    except Exception:  # noqa: BLE001
        _line("WARN", "orbax", "not importable — npz checkpoints only")

    try:
        importlib.import_module("torch")
        _line("PASS", "torch", "available (.pt import/export usable)")
    except Exception:  # noqa: BLE001
        _line("WARN", "torch", "not importable — .pt interop disabled")

    # --- host capture stack (optional: only live camera apps need these) ---
    for mod, why in (("cv2", "camera apps run sim=N only"),
                     ("mediapipe", "landmark inference unavailable")):
        try:
            importlib.import_module(mod)
            _line("PASS", mod, "importable")
        except Exception:  # noqa: BLE001
            _line("WARN", mod, f"not importable — {why}")

    from ..runtime.capture import LANDMARKER_ENV, resolve_landmarker_asset

    try:
        p = resolve_landmarker_asset("models/face_landmarker.task")
        _line("PASS", "landmarker asset", p)
    except FileNotFoundError:
        _line("WARN", "landmarker asset",
              f"models/face_landmarker.task not found (set {LANDMARKER_ENV} "
              "or pass model_path=; live camera apps will print the download "
              "instruction)")

    # --- mesh / sharding ---------------------------------------------------
    if jax is not None:
        try:
            n = len(jax.devices())
            from ..parallel import make_mesh

            mesh = make_mesh(jax.devices()[: max(1, n)],
                             data=max(1, n), model=1)
            _line("PASS", "mesh",
                  f"{dict(zip(mesh.axis_names, mesh.devices.shape))}")
        except Exception as e:  # noqa: BLE001
            _line("FAIL", "mesh", f"{type(e).__name__}: {e}")
            fails += 1
    else:
        _line("WARN", "mesh", "skipped (no usable jax backend)")

    print(("all checks passed" if fails == 0
           else f"{fails} FAILURE(S) — see above"))
    return 1 if fails else 0
