"""Benchmark: official-model inference throughput on one chip.

Metric (BASELINE.json north star): clips/sec/chip for 32-frame landmark+ROI
windows through the live-inference forward (the live_infer_official.py
compute path), batched, data device-resident. Target >= 5000 clips/s/chip.

Methodology notes:
- Dispatch latency to the device can be tens of ms (remote relay), so the
  timing loop runs *inside* one jitted program as a lax.scan over ITERS
  forward passes; wall time is measured around a single dispatch +
  materialization.
- Each iteration's inputs carry a (runtime-zero) data dependency on the
  previous iteration's logits so XLA cannot CSE or hoist any stage of the
  model out of the loop.

Prints exactly one JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N,
     "p50_frame_ms": N}

The second field covers the other half of the stated rebuild metric
(BASELINE.md:24 "clips/sec/chip; p50 per-frame inference latency"):
p50_frame_ms is the median on-chip step time of a B=1 live forward — the
work one new frame triggers in the reference's sliding-window live loop
(/root/reference/inactive/live_feed.py:154-227 re-runs the full window
forward per frame).
"""

from __future__ import annotations

import json
import os
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

BASELINE_CLIPS_PER_SEC = 5000.0
T = 32  # frames per clip (reference median clip length)
ITERS = 50
# SST_BENCH_QUICK=1: tiny shapes/iters — a smoke of the full code path
# (incl. the p50 block) on slow backends; NOT a valid chip number
_QUICK = bool(int(os.environ.get("SST_BENCH_QUICK", "0")))


def main():
    from silent_speech_tpu.models import bigru as model

    mcfg = model.BiGRUConfig(x_dim=180, num_classes=10, use_roi=True)
    params = model.init_params(jax.random.PRNGKey(0), mcfg)

    # roi_impl='fused' (parity-packed single-program Pallas CNN, stages
    # 2+3 tiled = variant 'tiled3', free-reshape h-mod-4 front) measured
    # 55.2k vs grouped's ~34k clips/s e2e at the same <=1e-3 parity bar
    # (scripts/bench_fused_cnn.py 2026-08-18; fidelity row
    # fused/scan/f32/parity in scripts/tpu_parity_check.py).
    # Pack once on host so the scan body reuses the packed weights instead
    # of re-packing per iteration. CPU fallback keeps the XLA path: the
    # fused kernel only interprets off-TPU (hours in SST_BENCH_QUICK even).
    from silent_speech_tpu.ops.pallas_cnn2 import pack_roi_cnn_fused
    from silent_speech_tpu.ops.pallas_gru import default_interpret

    on_tpu = not default_interpret()
    roi_impl = "fused" if on_tpu else "grouped"
    # pallas GRU: ~4% e2e + 0.11 ms p50 on-chip; parity-mode drift vs the
    # scan <=1.1e-4, shipped-mode audit row 8.76e-4 vs torch (2026-08-18)
    gru_impl = "pallas" if on_tpu else "scan"
    roi_packed = (pack_roi_cnn_fused(jax.tree.map(np.asarray,
                                                  params["roi_cnn"]))
                  if on_tpu else None)

    @partial(jax.jit, static_argnames=("iters",))
    def loop_fwd(params, X, lengths, roi, iters):
        def body(carry, _):
            Xc, Rc = carry
            # matmul_precision='parity': the headline number and the <=1e-3
            # on-chip fidelity bar are the SAME mode (docs/PRECISION.md;
            # ~1.5% below default-precision throughput)
            logits = model.live_forward(params, mcfg, Xc, lengths, Rc,
                                        roi_impl=roi_impl,
                                        roi_packed=roi_packed,
                                        roi_variant="tiled3",
                                        gru_impl=gru_impl,
                                        matmul_precision="parity")
            # runtime-zero feedback: keeps every iteration live and distinct
            eps = logits[0, 0] * 1e-30
            Xc = Xc + eps
            Rc = Rc + (eps > 1e30).astype(jnp.uint8)
            return (Xc, Rc), logits[0, 0]
        (Xf, _), outs = lax.scan(body, (X, roi), None, length=iters)
        return outs[-1] + Xf[0, 0, 0]

    rng = np.random.default_rng(0)
    best, best_B = 0.0, 0
    iters = 4 if _QUICK else ITERS
    for B in ((16,) if _QUICK else (256, 512, 1024)):
        X = jnp.asarray(rng.standard_normal((B, T, 180)).astype(np.float32))
        lengths = jnp.asarray(np.full((B,), T, np.int32))
        roi = jnp.asarray(rng.integers(0, 256, (B, T, 48, 96), dtype=np.uint8))
        float(loop_fwd(params, X, lengths, roi, 2))  # compile + warm
        float(loop_fwd(params, X, lengths, roi, iters))  # warm the big loop
        t0 = time.perf_counter()
        float(loop_fwd(params, X, lengths, roi, iters))
        dt = (time.perf_counter() - t0) / iters
        cps = B / dt
        if cps > best:
            best, best_B = cps, B

    # p50 per-frame latency: B=1 live forward, the per-frame work of the
    # sliding-window live loop. Same chained-scan trick (each sample is one
    # dispatch of a LAT_ITERS-step scan, so relay dispatch wall is amortized
    # out and the number is the on-chip step time); p50 over repeats.
    LAT_ITERS, LAT_REPS = (8, 3) if _QUICK else (64, 9)
    X1 = jnp.asarray(rng.standard_normal((1, T, 180)).astype(np.float32))
    l1 = jnp.asarray(np.full((1,), T, np.int32))
    r1 = jnp.asarray(rng.integers(0, 256, (1, T, 48, 96), dtype=np.uint8))
    float(loop_fwd(params, X1, l1, r1, 2))  # compile
    float(loop_fwd(params, X1, l1, r1, LAT_ITERS))  # warm
    samples = []
    for _ in range(LAT_REPS):
        t0 = time.perf_counter()
        float(loop_fwd(params, X1, l1, r1, LAT_ITERS))
        samples.append((time.perf_counter() - t0) / LAT_ITERS * 1e3)
    p50_frame_ms = float(np.median(samples))

    print(
        json.dumps(
            {
                "metric": f"inference_clips_per_sec_per_chip_T{T}_B{best_B}",
                "value": round(best, 1),
                "unit": "clips/s",
                "vs_baseline": round(best / BASELINE_CLIPS_PER_SEC, 3),
                "p50_frame_ms": round(p50_frame_ms, 4),
            }
        )
    )


def _wait_for_backend() -> bool:
    """Bounded retry window for a wedged device relay (VERDICT r3 weak 2).

    A transient relay wedge at driver-snapshot time must not zero the whole
    round's metric, so instead of one probe-and-exit we re-probe every
    SST_BENCH_RETRY_INTERVAL_S (default 300 s) for up to
    SST_BENCH_RETRY_WINDOW_S (default 2700 s) before giving up. Interactive
    runs can set the window to 0 to restore fail-fast.
    """
    import sys

    from __graft_entry__ import _backends_alive

    window = float(os.environ.get("SST_BENCH_RETRY_WINDOW_S", "2700"))
    interval = float(os.environ.get("SST_BENCH_RETRY_INTERVAL_S", "300"))
    deadline = time.monotonic() + window
    if _backends_alive():
        return True
    while time.monotonic() < deadline:
        left = deadline - time.monotonic()
        print(
            f"bench: backend init unresponsive (wedged device relay?) — "
            f"re-probing in {interval:.0f}s ({left / 60:.0f} min left in "
            "the retry window)",
            file=sys.stderr,
        )
        time.sleep(min(interval, max(left, 0.0)))
        if _backends_alive():
            print("bench: backend recovered — running", file=sys.stderr)
            return True
    return False


if __name__ == "__main__":
    import sys

    if not _wait_for_backend():
        # no JSON line: a CPU fallback number would misrepresent the chip
        # metric — exit nonzero and explained instead of hanging forever
        print(
            "bench: backend init unresponsive for the whole retry window — "
            "aborting; re-run when the relay is back",
            file=sys.stderr,
        )
        sys.exit(1)
    main()
