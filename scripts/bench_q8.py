"""On-chip measurement for the int8 fused-CNN serving variant
(roi_variant='tiled3_q8', ops/pallas_cnn2.py).

scripts/probe_int8.py measured the MXU's s8 x s8 -> s32 mode at 1.60-1.65x
the f32 rate on the fused kernel's exact tile shapes ((384, 384/512) x
(., .) chained dots), and docs/ROI_CNN_PERF.md round-5 closed the tiled3
kernel as MXU-bound end to end (dots 64-69 T MAC/s of a 78.8 ceiling).
tiled3_q8 converts every stage dot to int8 and every inter-stage scratch
to s8 (4x fewer copy bytes); this script answers whether that converts to
a kernel/e2e win and at what fidelity:

  1. on-chip q8-vs-grouped embedding error (quantization noise, expected
     ~0.1-1% of the embedding scale — the interpret-mode figure);
  2. standalone kernel ms per 8192 frames: tiled3 f32 / bf16 / tiled3_q8;
  3. e2e live forward at the bench shape (B=256, T=32, parity precision,
     pallas GRU = the shipped serving stack) for tiled3 vs tiled3_q8;
  4. logit drift + argmax agreement of the q8 e2e forward vs the f32
     parity forward (random-init model; the trained-model guardrail lives
     in tests/test_bf16_parity.py / scripts/tpu_parity_check.py);
  5. a bench.py-identical B sweep (256/512/1024, T=32, chained scan) so
     BASELINE.md can carry a q8 row at the same shape as the f32-parity
     headline and the bf16 row (scripts/bench_bf16.py).

Run on the real chip, one job at a time: python scripts/bench_q8.py
"""

from __future__ import annotations

import sys as _sys, pathlib as _pathlib  # _REPO_ROOT_BOOTSTRAP: run without PYTHONPATH
_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parent.parent))

import functools
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

N_FRAMES = 8192
ITERS = 30


def timed(fn, args, iters=ITERS):
    """Chained-scan on-chip timing (relay dispatch amortized out)."""

    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(args, n):
        def body(c, _):
            out = fn(*jax.tree.map(lambda x: x + c if x.dtype == jnp.uint8
                                   else x, args))
            return (jnp.sum(out[:1, :1]) * 1e-30).astype(jnp.uint8), out[0, 0]
        _, outs = lax.scan(body, jnp.uint8(0), None, length=n)
        return outs[-1]

    float(loop(args, 2))
    float(loop(args, iters))
    t0 = time.perf_counter()
    float(loop(args, iters))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    from silent_speech_tpu.models import bigru as model
    from silent_speech_tpu.models.bigru import preprocess_roi
    from silent_speech_tpu.ops.grouped_cnn import roi_cnn_grouped
    from silent_speech_tpu.ops.pallas_cnn2 import (
        pack_roi_cnn_fused, roi_cnn_fused)

    mcfg = model.BiGRUConfig(x_dim=180, num_classes=10, use_roi=True)
    params = model.init_params(jax.random.PRNGKey(0), mcfg)
    cnn = params["roi_cnn"]
    packed = pack_roi_cnn_fused(cnn, variant="tiled3")
    packed_q8 = pack_roi_cnn_fused(cnn, variant="tiled3_q8")

    rng = np.random.default_rng(0)
    roi = jnp.asarray(rng.integers(0, 256, (N_FRAMES, 48, 96),
                                   dtype=np.uint8))

    want = np.asarray(roi_cnn_grouped(cnn, preprocess_roi(roi[:256], False)))
    got = np.asarray(roi_cnn_fused(roi[:256], packed_q8,
                                   variant="tiled3_q8"))
    err = np.abs(got - want).max()
    print(f"on-chip q8 embedding err vs grouped: max|err| = {err:.2e} "
          f"({err / np.abs(want).max():.2%} of emb scale)", flush=True)

    def tiled3(r):
        return roi_cnn_fused(r, packed, variant="tiled3")

    def tiled3_bf16(r):
        return roi_cnn_fused(r, packed, variant="tiled3",
                             compute_dtype=jnp.bfloat16)

    def q8(r):
        return roi_cnn_fused(r, packed_q8, variant="tiled3_q8")

    t3 = timed(tiled3, (roi,))
    print(f"standalone tiled3    f32 : {t3:6.2f} ms / {N_FRAMES} frames",
          flush=True)
    tb = timed(tiled3_bf16, (roi,))
    print(f"standalone tiled3    bf16: {tb:6.2f} ms", flush=True)
    tq = timed(q8, (roi,))
    print(f"standalone tiled3_q8     : {tq:6.2f} ms  "
          f"({t3 / tq:.2f}x vs f32)", flush=True)

    # end-to-end live forward at the bench shape, shipped serving stack
    T = 32
    B = N_FRAMES // T
    X = jnp.asarray(rng.standard_normal((B, T, 180)).astype(np.float32))
    lengths = jnp.asarray(np.full((B,), T, np.int32))
    roi4 = roi.reshape(B, T, 48, 96)

    outs = {}
    for variant, pk in (("tiled3", packed), ("tiled3_q8", packed_q8)):
        def fwd(X, roi4, _v=variant, _p=pk):
            return model.live_forward(
                params, mcfg, X, lengths, roi4, roi_impl="fused",
                roi_packed=_p, roi_variant=_v, gru_impl="pallas",
                matmul_precision="parity")
        outs[variant] = np.asarray(fwd(X, roi4))
        t = timed(fwd, (X, roi4))
        print(f"e2e live fwd (fused/{variant:9s} f32 parity, pallas GRU): "
              f"{t:6.2f} ms -> {B / (t / 1e3):8.0f} clips/s", flush=True)

    drift = np.abs(outs["tiled3_q8"] - outs["tiled3"]).max()
    agree = (outs["tiled3_q8"].argmax(-1)
             == outs["tiled3"].argmax(-1)).mean()
    print(f"e2e q8 logit drift vs f32 parity: {drift:.4f}, "
          f"argmax agreement {agree:.3f} (random-init model)", flush=True)

    # ---- bench.py-identical sweep: headline-shape q8 row ----
    SWEEP_ITERS = 50
    for variant, pk in (("tiled3", packed), ("tiled3_q8", packed_q8)):
        @functools.partial(jax.jit, static_argnames=("iters",))
        def loop_fwd(params, X, lengths, roi, iters, _v=variant, _p=pk):
            def body(carry, _):
                Xc, Rc = carry
                logits = model.live_forward(
                    params, mcfg, Xc, lengths, Rc, roi_impl="fused",
                    roi_packed=_p, roi_variant=_v, gru_impl="pallas",
                    matmul_precision="parity")
                eps = logits[0, 0] * 1e-30
                return (Xc + eps, Rc + (eps > 1e30).astype(jnp.uint8)), \
                    logits[0, 0]
            (Xf, _), outs = lax.scan(body, (X, roi), None, length=iters)
            return outs[-1] + Xf[0, 0, 0]

        best, best_B = 0.0, 0
        for B in (256, 512, 1024):
            Xs = jnp.asarray(rng.standard_normal((B, T, 180))
                             .astype(np.float32))
            ls = jnp.asarray(np.full((B,), T, np.int32))
            rs = jnp.asarray(rng.integers(0, 256, (B, T, 48, 96),
                                          dtype=np.uint8))
            float(loop_fwd(params, Xs, ls, rs, 2))
            float(loop_fwd(params, Xs, ls, rs, SWEEP_ITERS))
            t0 = time.perf_counter()
            float(loop_fwd(params, Xs, ls, rs, SWEEP_ITERS))
            cps = B / ((time.perf_counter() - t0) / SWEEP_ITERS)
            print(f"bench-sweep {variant:9s} B={B:4d}: {cps:8.0f} clips/s",
                  flush=True)
            if cps > best:
                best, best_B = cps, B
        print(f"bench-sweep {variant:9s} best: {best:8.0f} clips/s "
              f"at B={best_B}", flush=True)


if __name__ == "__main__":
    main()
