"""Full live-forward benchmark across impl variants (gru_impl x roi_impl x
dtype) at the bench.py shapes — decides what bench.py/Predictor should
default to. One line per variant + argmax-parity check vs the f32 baseline.

Usage: python scripts/bench_fwd_variants.py [iters]
"""

from __future__ import annotations

import sys as _sys, pathlib as _pathlib  # _REPO_ROOT_BOOTSTRAP: run without PYTHONPATH
_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parent.parent))

import sys
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from silent_speech_tpu.models import bigru as model

T = 32
ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 50


def bench(B, mcfg, params, gru_impl, roi_impl, dtype):
    @partial(jax.jit, static_argnames=("iters",))
    def loop_fwd(params, X, lengths, roi, iters):
        def body(carry, _):
            Xc, Rc = carry
            logits = model.live_forward(params, mcfg, Xc, lengths, Rc,
                                        compute_dtype=dtype,
                                        gru_impl=gru_impl, roi_impl=roi_impl)
            eps = logits[0, 0] * 1e-30
            Xc = Xc + eps
            Rc = Rc + (eps > 1e30).astype(jnp.uint8)
            return (Xc, Rc), logits[0, 0]
        (Xf, _), outs = lax.scan(body, (X, roi), None, length=iters)
        return outs[-1] + Xf[0, 0, 0]

    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.standard_normal((B, T, 180)).astype(np.float32))
    lengths = jnp.asarray(rng.integers(8, T + 1, (B,)).astype(np.int32))
    roi = jnp.asarray(rng.integers(0, 256, (B, T, 48, 96), dtype=np.uint8))
    float(loop_fwd(params, X, lengths, roi, 2))
    float(loop_fwd(params, X, lengths, roi, ITERS))
    t0 = time.perf_counter()
    float(loop_fwd(params, X, lengths, roi, ITERS))
    dt = (time.perf_counter() - t0) / ITERS
    logits = model.live_forward(params, mcfg, X, lengths, roi,
                                compute_dtype=dtype,
                                gru_impl=gru_impl, roi_impl=roi_impl)
    return dt, np.asarray(logits)


def main():
    mcfg = model.BiGRUConfig(x_dim=180, num_classes=10, use_roi=True)
    params = model.init_params(jax.random.PRNGKey(0), mcfg)
    for B in (256, 512):
        ref_logits = None
        for gru_impl, roi_impl, dtype, tag in (
            ("scan", "grouped", jnp.float32, "scan/grouped/f32"),
            ("pallas", "grouped", jnp.float32, "pallas/grouped/f32"),
            ("scan", "grouped", jnp.bfloat16, "scan/grouped/bf16"),
            ("pallas", "grouped", jnp.bfloat16, "pallas/grouped/bf16"),
        ):
            try:
                dt, logits = bench(B, mcfg, params, gru_impl, roi_impl, dtype)
                if ref_logits is None:
                    ref_logits = logits
                    err, agree = 0.0, 1.0
                else:
                    err = float(np.max(np.abs(logits - ref_logits)))
                    agree = float(np.mean(
                        logits.argmax(-1) == ref_logits.argmax(-1)))
                print(f"B={B} {tag:>20s}: {dt*1e3:7.3f} ms  "
                      f"{B/dt:9.0f} clips/s  maxerr={err:.2e} argmax={agree:.3f}",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"B={B} {tag:>20s}: FAILED {type(e).__name__}: "
                      f"{str(e).splitlines()[0][:140]}", flush=True)


if __name__ == "__main__":
    main()
