"""ROI-CNN profiling harness (VERDICT r1 item 2).

Times every TinyROICNN implementation variant at the bench scale (8192
frames) with the in-graph scan methodology (relay dispatch excluded), and
captures a jax.profiler trace of the winning live forward.

Usage: python scripts/profile_roi.py [--trace DIR] [--iters N]
"""

from __future__ import annotations

import sys as _sys, pathlib as _pathlib  # _REPO_ROOT_BOOTSTRAP: run without PYTHONPATH
_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parent.parent))

import argparse
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

N_FRAMES = 8192
ITERS = 30


def timed_scan(fn, x, iters=ITERS):
    """Time fn(x)->(N,emb) chained through a lax.scan (bench.py protocol)."""

    @partial(jax.jit, static_argnames=("n",))
    def loop(x, n):
        def body(c, _):
            out = fn(c)
            eps = out[0, 0] * 1e-30
            c = c + (eps > 1e30).astype(c.dtype) if c.dtype == jnp.uint8 \
                else c + eps.astype(c.dtype)
            return c, out[0, 0]
        c, outs = lax.scan(body, x, None, length=n)
        return outs[-1] + c.reshape(-1)[0].astype(jnp.float32)

    float(loop(x, 2))
    float(loop(x, iters))
    t0 = time.perf_counter()
    float(loop(x, iters))
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", default="")
    ap.add_argument("--iters", type=int, default=ITERS)
    args = ap.parse_args()

    from silent_speech_tpu.models import bigru as model
    from silent_speech_tpu.models.bigru import preprocess_roi, roi_cnn_forward
    from silent_speech_tpu.ops.grouped_cnn import roi_cnn_grouped
    from silent_speech_tpu.ops.pallas_cnn import (
        pack_roi_cnn_params,
        roi_cnn_pallas,
    )

    mcfg = model.BiGRUConfig(x_dim=180, num_classes=10, use_roi=True)
    params = model.init_params(jax.random.PRNGKey(0), mcfg)
    cnn = params["roi_cnn"]
    packed = pack_roi_cnn_params(cnn)
    rng = np.random.default_rng(0)
    roi_u8 = jnp.asarray(
        rng.integers(0, 256, (N_FRAMES, 48, 96), dtype=np.uint8))

    def xla_f32(r):
        x = preprocess_roi(r, False)
        return roi_cnn_forward(cnn, x[None]).reshape(N_FRAMES, -1)

    def grouped_f32(r):
        x = preprocess_roi(r, False)
        return roi_cnn_grouped(cnn, x)

    def grouped_bf16(r):
        x = preprocess_roi(r, False).astype(jnp.bfloat16)
        return roi_cnn_grouped(cnn, x).astype(jnp.float32)

    def pallas_f32(r):
        return roi_cnn_pallas(r, packed, standardize=False)

    variants = {
        "xla_f32": xla_f32,
        "grouped_f32": grouped_f32,
        "grouped_bf16": grouped_bf16,
        "pallas_f32": pallas_f32,
    }
    results = {}
    for name, fn in variants.items():
        try:
            dt = timed_scan(fn, roi_u8, args.iters)
            results[name] = dt * 1e3
            print(f"{name:>14}: {dt * 1e3:7.2f} ms / {N_FRAMES} frames "
                  f"({N_FRAMES / dt / 1e6:.1f} Mframes/s)")
        except Exception as e:  # noqa: BLE001 - report and continue
            print(f"{name:>14}: FAILED {type(e).__name__}: {e}")

    if args.trace:
        best = min(results, key=results.get)
        fn = jax.jit(variants[best])
        fn(roi_u8).block_until_ready()
        with jax.profiler.trace(args.trace):
            for _ in range(5):
                out = fn(roi_u8)
            np.asarray(out)
        print(f"trace of {best} written to {args.trace}")


if __name__ == "__main__":
    main()
