"""Measure the parity-packed fully-fused ROI CNN (ops/pallas_cnn2.py,
roi_impl='fused') against the shipped paths, with the stage ablation and the
MXU-rate probe that decide whether the full fusion wins (VERDICT r3 item 2).

Run on the real chip (one job at a time through the relay):

    python scripts/bench_fused_cnn.py            # full comparison
    python scripts/bench_fused_cnn.py mxu        # packed-shape MXU rates only

Decision arithmetic (docs/ROI_CNN_PERF.md): the fused kernel's packed MACs
at N=8192 frames total ~270 G (stage1 31 G + stage2 174 G + stage3 65 G).
At the doc's 4096^3-measured 26.7 T MAC/s the matmul floor alone (10 ms)
loses to grouped (5.78 ms f32); at the ~75 T MAC/s implied by
ops/pallas_cnn.py's in-kernel ablation ("MACs ~2 ms of MXU time") it wins
(~3.6 ms + overhead). The `mxu` probe measures the truth for the exact
packed shapes, VMEM-resident, chained inside one jit.
"""

from __future__ import annotations

import sys as _sys, pathlib as _pathlib  # _REPO_ROOT_BOOTSTRAP: run without PYTHONPATH
_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parent.parent))

import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

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


# ----------------------------------------------------------------------------
# MXU rate probe: the exact packed matmul shapes, VMEM-resident
# ----------------------------------------------------------------------------

def _mm_kernel(reps: int, a_ref, b_ref, o_ref):
    acc = jnp.zeros_like(o_ref)
    a = a_ref[...]
    for r in range(reps):
        # rotate lanes so reps can't be CSE'd; roll is cheap vs the dot
        acc = acc + jnp.dot(pltpu.roll(a, r % 8, axis=1), b_ref[...],
                            preferred_element_type=jnp.float32)
    o_ref[...] = acc


def mxu_rate(M, K, N, reps=64, grid=64):
    a = jnp.asarray(np.random.default_rng(0).standard_normal((M, K)),
                    jnp.float32)
    b = jnp.asarray(np.random.default_rng(1).standard_normal((K, N)),
                    jnp.float32)
    f = pl.pallas_call(
        functools.partial(_mm_kernel, reps),
        grid=(grid,),
        in_specs=[pl.BlockSpec((M, K), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((K, N), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((M, N), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
    )
    g = jax.jit(lambda a, b: f(a, b))
    np.asarray(g(a, b))
    t0 = time.perf_counter()
    np.asarray(g(a, b))
    dt = time.perf_counter() - t0
    macs = M * K * N * reps * grid
    return macs / dt / 1e12


def probe_mxu():
    print("== MXU rate probe (f32 in, f32 acc, VMEM-resident) ==")
    for M, K, N, tag in (
        (192, 104, 128, "stage1 tile"),
        (192, 1152, 384, "stage2 full-width"),
        (192, 512, 128, "stage2 tiled alt"),
        (192, 1152, 576, "stage3 full-width"),
        (512, 512, 512, "square 512"),
        (1024, 1024, 1024, "square 1024"),
    ):
        # the 64-rep unrolled roll+dot chain keeps several rolled copies
        # live on the VMEM stack; big squares can exceed the 16M scoped
        # limit — report and continue rather than killing the e2e rows.
        try:
            r = mxu_rate(M, K, N)
        except Exception as e:  # noqa: BLE001 - report any compile failure
            print(f"  ({M:5d},{K:5d},{N:5d}) {tag:20s}: FAILED "
                  f"({type(e).__name__}: {str(e)[:80]}...)")
            continue
        print(f"  ({M:5d},{K:5d},{N:5d}) {tag:20s}: {r:6.1f} T MAC/s")
    sys.stdout.flush()


# ----------------------------------------------------------------------------
# kernel comparison + ablation
# ----------------------------------------------------------------------------

def main():
    from silent_speech_tpu.models import bigru as model
    from silent_speech_tpu.models.bigru import preprocess_roi
    from silent_speech_tpu.ops import pallas_cnn2
    from silent_speech_tpu.ops.grouped_cnn import roi_cnn_grouped
    from silent_speech_tpu.ops.pallas_cnn2 import (
        pack_roi_cnn_fused, roi_cnn_fused)

    mcfg = model.BiGRUConfig(x_dim=180, num_classes=10, use_roi=True)
    params = model.init_params(jax.random.PRNGKey(0), mcfg)
    cnn = params["roi_cnn"]
    packed = pack_roi_cnn_fused(cnn)

    rng = np.random.default_rng(0)
    roi = jnp.asarray(rng.integers(0, 256, (N_FRAMES, 48, 96), dtype=np.uint8))

    want = np.asarray(roi_cnn_grouped(cnn, preprocess_roi(roi[:256], False)))
    for variant in ("wide", "tiled", "tiled3"):
        got = np.asarray(roi_cnn_fused(roi[:256], packed, variant=variant))
        err = np.abs(got - want).max()
        print(f"on-chip correctness vs grouped ({variant}): "
              f"max|err| = {err:.2e}")

    def fused(r):
        return roi_cnn_fused(r, packed)

    def fused_tiled(r):
        return roi_cnn_fused(r, packed, variant="tiled")

    def fused_bf16(r):
        return roi_cnn_fused(r, packed, compute_dtype=jnp.bfloat16)

    def fused_tiled_bf16(r):
        return roi_cnn_fused(r, packed, variant="tiled",
                             compute_dtype=jnp.bfloat16)

    def grouped(r):
        return roi_cnn_grouped(cnn, preprocess_roi(r, False))

    def grouped_bf16(r):
        return roi_cnn_grouped(
            cnn, preprocess_roi(r, False).astype(jnp.bfloat16)
        ).astype(jnp.float32)

    print(f"grouped     f32 : {timed(grouped, (roi,)):6.2f} ms / {N_FRAMES} frames")
    print(f"fused-wide  f32 : {timed(fused, (roi,)):6.2f} ms")
    print(f"fused-tiled f32 : {timed(fused_tiled, (roi,)):6.2f} ms")
    print(f"grouped     bf16: {timed(grouped_bf16, (roi,)):6.2f} ms")
    print(f"fused-wide  bf16: {timed(fused_bf16, (roi,)):6.2f} ms")
    print(f"fused-tiled bf16: {timed(fused_tiled_bf16, (roi,)):6.2f} ms")

    print("== stage ablation (cumulative cost up to each stage) ==")
    for stop in ("conv1", "conv2", "conv3", None):
        pallas_cnn2._DEBUG_STOP_AFTER = stop
        jax.clear_caches()  # the knob is baked at trace time
        t = timed(fused, (roi,))
        print(f"  up to {stop or 'full':5s}: {t:6.2f} ms")
    pallas_cnn2._DEBUG_STOP_AFTER = None
    jax.clear_caches()

    # end-to-end live forward at the bench shape
    T = 32
    B = N_FRAMES // T
    X = jnp.asarray(rng.standard_normal((B, T, 180)).astype(np.float32))
    lengths = jnp.asarray(np.full((B,), T, np.int32))
    roi4 = roi.reshape(B, T, 48, 96)

    for impl, variant, cdt in (
        ("grouped", "-", jnp.float32),
        ("fused", "wide", jnp.float32),
        ("fused", "tiled", jnp.float32),
        ("fused", "tiled3", jnp.float32),
        ("grouped", "-", jnp.bfloat16),
        ("fused", "wide", jnp.bfloat16),
        ("fused", "tiled", jnp.bfloat16),
        ("fused", "tiled3", jnp.bfloat16),
    ):
        def fwd(X, roi4):
            return model.live_forward(
                params, mcfg, X, lengths, roi4, roi_impl=impl,
                roi_packed=packed if impl == "fused" else None,
                roi_variant=variant if impl == "fused" else "wide",
                compute_dtype=cdt,
                matmul_precision="parity")
        t = timed(fwd, (X, roi4))
        dt_tag = "bf16" if cdt == jnp.bfloat16 else "f32"
        print(f"e2e live fwd ({impl:7s}/{variant:5s} {dt_tag:4s}, parity): "
              f"{t:6.2f} ms -> {B * ITERS / (t * ITERS / 1e3):8.0f} clips/s")
        sys.stdout.flush()


def sweep_f_tile():
    """f_tile (frames per grid step, M = 12*f_tile matmul rows) sweep:
    standalone kernel at N_FRAMES + e2e live forward at the bench shape.
    Decides the shipped F_TILE default (ops/pallas_cnn2.py)."""
    from silent_speech_tpu.models import bigru as model
    from silent_speech_tpu.ops.pallas_cnn2 import (
        pack_roi_cnn_fused, roi_cnn_fused)

    mcfg = model.BiGRUConfig(x_dim=180, num_classes=10, use_roi=True)
    params = model.init_params(jax.random.PRNGKey(0), mcfg)
    packed = pack_roi_cnn_fused(params["roi_cnn"])
    rng = np.random.default_rng(0)
    roi = jnp.asarray(rng.integers(0, 256, (N_FRAMES, 48, 96), dtype=np.uint8))

    base = None
    for variant in ("tiled3", "tiled", "wide"):
        for f_tile in (8, 16, 32, 64):
            def fn(r, _v=variant, _f=f_tile):
                return roi_cnn_fused(r, packed, variant=_v, f_tile=_f)
            try:
                t = timed(fn, (roi,))
            except Exception as e:  # noqa: BLE001 - report and continue
                print(f"standalone {variant:5s} f_tile={f_tile:3d}: FAILED "
                      f"{type(e).__name__}: {str(e).splitlines()[0][:100]}")
                continue
            got = np.asarray(fn(roi[:256]))
            if base is None:
                base = got
            err = float(np.abs(got - base).max())
            print(f"standalone {variant:5s} f_tile={f_tile:3d}: {t:6.2f} ms "
                  f"/ {N_FRAMES} frames  maxdiff={err:.1e}")
            sys.stdout.flush()

    T = 32
    B = N_FRAMES // T
    X = jnp.asarray(rng.standard_normal((B, T, 180)).astype(np.float32))
    lengths = jnp.asarray(np.full((B,), T, np.int32))
    roi4 = roi.reshape(B, T, 48, 96)
    for f_tile in (16, 32, 64):
        def fwd(X, roi4, _f=f_tile):
            return model.live_forward(
                params, mcfg, X, lengths, roi4, roi_impl="fused",
                roi_packed=packed, roi_variant="tiled", roi_f_tile=_f,
                matmul_precision="parity")
        try:
            t = timed(fwd, (X, roi4))
        except Exception as e:  # noqa: BLE001
            print(f"e2e tiled f_tile={f_tile:3d}: FAILED "
                  f"{type(e).__name__}: {str(e).splitlines()[0][:100]}")
            continue
        print(f"e2e live fwd (tiled f_tile={f_tile:3d}, parity): {t:6.2f} ms "
              f"-> {B / (t / 1e3):8.0f} clips/s")
        sys.stdout.flush()


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "mxu":
        probe_mxu()
    elif len(sys.argv) > 1 and sys.argv[1] == "ftile":
        sweep_f_tile()
    else:
        probe_mxu()
        main()
