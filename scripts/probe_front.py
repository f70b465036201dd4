"""Byte-roofline probe for the fused ROI-CNN kernel's input front
(VERDICT r4 item 7).

The round-4 stage ablation left the front (u8 block load + widen + /255 +
halo fill) as the largest non-dot term, but its `_DEBUG_STOP_AFTER`
readings are confounded by the debug stop's own cross-lane reduction. This
probe isolates each front op in its own Pallas micro-kernel at the EXACT
shipped block geometry (grid of (M, 384) u8 blocks, M = F_TILE*12 = 384),
so the table reads as a cumulative cost ladder:

  dma        — block HBM->VMEM copy only (touches one sublane row): the
               pure input-stream roofline. 8192 frames = 37.75 MB of u8.
  widen      — + in-kernel u8 -> i32 -> f32 widen and /255 scale
               (ops/pallas_cnn2._front_widen) + a full-block VPU sum
               (the sum forces every element; its cost is shared by every
               later row, so deltas attribute cleanly).
  front      — + the h-mod-4 class slices and the 4x(M,128) zeroed halo
               fills (_front_classes(std=False) + the halo stores) — the
               complete live-serving front.
  front_std  — same with per-frame standardization (the training front).

Two follow-up experiments settle how to read the ladder:

  dma@F      — the dma row re-run at F_TILE 16/64 (per-step count 2x up /
               2x down). Flat => bandwidth-bound stream; scaling with step
               count => per-step DMA latency floor.
  overlap    — A/B pair at the shipped F_TILE: kernel A runs the complete
               live front then a serial chain of (M,384)x(384,384) dots
               (~the real kernel's per-step MXU time); kernel B runs the
               SAME dot chain seeded from an 8x128 input block (no input
               stream). A-B is the front's cost WHEN THE MXU IS BUSY —
               i.e. whether the input DMA hides under the stage dots the
               way the shipped kernel pipelines them.

Cross-reference rows re-run the real tiled3 kernel's _DEBUG_STOP_AFTER
'load'/'norm' stops and the full kernel on the same day.

Run on the real chip: python scripts/probe_front.py
"""

from __future__ import annotations

import sys as _sys, pathlib as _pathlib  # _REPO_ROOT_BOOTSTRAP: run without PYTHONPATH
_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parent.parent))

import functools
import json
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from silent_speech_tpu.ops import pallas_cnn2
from silent_speech_tpu.ops.pallas_cnn2 import (
    F_TILE, HQ, W0, _front_classes, _front_widen,
    pack_roi_cnn_fused, roi_cnn_fused,
)

N_FRAMES = 8192
ITERS = 50
F = F_TILE
M = F * HQ
# serial chain of (M, 384)x(384, 384) dots per grid step: 56.6M MACs each,
# ~0.87 us at the measured 65 T MAC/s packed rate; DEPTH=14 ~= the shipped
# tiled3 kernel's ~12 us of per-step MXU time
DEPTH = 14


def _probe_kernel(stage: str, F: int, x_ref, o_ref, *scratch):
    if stage == "dma":
        # whole (M, 384) block is DMA'd by the BlockSpec regardless; touch
        # a single sublane row so the VPU does ~nothing
        o_ref[...] = (jnp.zeros_like(o_ref)
                      + x_ref[0:1, 0:128].astype(jnp.int32)
                      .astype(jnp.float32)[None])
        return
    if stage == "overlap_b":
        # dot chain only, seeded from an 8x128 block (no input stream);
        # w scratch is uninitialized — values are irrelevant for timing
        w_ref, = scratch
        # u8 scalar extracts don't lower on Mosaic — widen the whole tiny
        # block through i32 and reduce to a scalar instead
        seed = (jnp.sum(x_ref[...].astype(jnp.int32)).astype(jnp.float32)
                * 1e-6)
        y = jnp.zeros((F * HQ, 4 * W0), jnp.float32) + seed
        for _ in range(DEPTH):
            y = jnp.dot(y, w_ref[...], preferred_element_type=jnp.float32)
        o_ref[...] = jnp.zeros_like(o_ref) + jnp.sum(y[0:1, 0:128])
        return
    xw = _front_widen(x_ref, "u8")
    if stage == "widen":
        o_ref[...] = jnp.zeros_like(o_ref) + jnp.sum(xw)
        return
    halo_ref = scratch[0]
    xs = _front_classes(xw, stage == "front_std", F)
    for c in range(4):
        halo_ref[c] = jnp.zeros_like(halo_ref[c])
        halo_ref[c, :, 1:1 + W0] = xs[c]
    if stage == "overlap_a":
        # complete live front + the same dot chain as overlap_b: A-B is
        # the front's cost while the MXU is busy the way the shipped
        # kernel keeps it busy
        w_ref = scratch[1]
        y = xw
        for _ in range(DEPTH):
            y = jnp.dot(y, w_ref[...], preferred_element_type=jnp.float32)
        o_ref[...] = (jnp.zeros_like(o_ref) + jnp.sum(y[0:1, 0:128])
                      + jnp.sum(halo_ref[...]))
        return
    o_ref[...] = jnp.zeros_like(o_ref) + jnp.sum(halo_ref[...])


def build(stage: str, F: int = F_TILE):
    Mv = F * HQ
    grid = N_FRAMES // F
    in_shape = (8, 128) if stage == "overlap_b" else (Mv, 4 * W0)
    scratch = []
    if stage not in ("dma", "widen", "overlap_b"):
        scratch.append(pltpu.VMEM((4, Mv, 128), jnp.float32))
    if stage in ("overlap_a", "overlap_b"):
        scratch.append(pltpu.VMEM((4 * W0, 4 * W0), jnp.float32))
    return pl.pallas_call(
        functools.partial(_probe_kernel, stage, F),
        grid=(grid,),
        in_specs=[pl.BlockSpec(in_shape, lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((grid, 8, 128), jnp.float32),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )


def timed(fn, args, iters=ITERS):
    """Chained-scan on-chip timing (relay dispatch amortized out)."""

    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(args, n):
        def body(c, _):
            out = fn(*jax.tree.map(lambda x: x + c if x.dtype == jnp.uint8
                                   else x, args))
            return ((jnp.sum(out[:1, :1]) * 1e-30).astype(jnp.uint8),
                    out.reshape(-1)[0])
        _, outs = lax.scan(body, jnp.uint8(0), None, length=n)
        return outs[-1]

    float(loop(args, 2))
    float(loop(args, iters))
    t0 = time.perf_counter()
    float(loop(args, iters))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    assert jax.default_backend() == "tpu", "run on the TPU backend"
    rng = np.random.default_rng(0)
    roi = rng.integers(0, 256, (N_FRAMES, 48, 96), dtype=np.uint8)
    x_in = jnp.asarray(roi.reshape(N_FRAMES * HQ, 4 * W0))
    in_mb = x_in.size / 1e6

    out = {}
    prev = 0.0
    print(f"== front ladder ({N_FRAMES} frames, {in_mb:.1f} MB u8 in, "
          f"F_TILE={F}) ==")
    for stage in ("dma", "widen", "front", "front_std"):
        ms = timed(build(stage), (x_in,))
        gbs = x_in.size / (ms * 1e-3) / 1e9
        print(f"  {stage:10s}: {ms:6.3f} ms  (+{ms - prev:6.3f})  "
              f"[{gbs:6.0f} GB/s of u8 stream]", flush=True)
        out[stage] = round(ms, 3)
        prev = ms

    # DMA-vs-F_TILE: per-step latency floor vs bandwidth bound
    print(f"== dma vs F_TILE (same {in_mb:.1f} MB stream) ==")
    for Fv in (16, 32, 64):
        ms = timed(build("dma", Fv), (x_in,))
        print(f"  dma@F={Fv:<3d}: {ms:6.3f} ms  ({N_FRAMES // Fv} steps, "
              f"{x_in.size / (ms * 1e-3) / 1e9:6.0f} GB/s)", flush=True)
        out[f"dma_f{Fv}"] = round(ms, 3)

    # overlap A/B: is the input DMA + front hidden when the MXU is busy?
    print(f"== overlap A/B (DEPTH={DEPTH} chained (M,384)x(384,384) dots) ==")
    ms_a = timed(build("overlap_a"), (x_in,))
    print(f"  A front+dots: {ms_a:6.3f} ms", flush=True)
    x_small = jnp.asarray(
        rng.integers(0, 256, (N_FRAMES // F * 8, 128), dtype=np.uint8))
    ms_b = timed(build("overlap_b"), (x_small,))
    print(f"  B dots only : {ms_b:6.3f} ms"
          f"\n  A-B (front cost under MXU load): {ms_a - ms_b:6.3f} ms",
          flush=True)
    out["overlap_a"] = round(ms_a, 3)
    out["overlap_b"] = round(ms_b, 3)

    # cross-reference: the real kernel's debug stops + the full kernel
    conv = lambda *s: {"w": rng.standard_normal(s).astype(np.float32) * 0.1,
                       "b": rng.standard_normal(s[-1:]).astype(np.float32)}
    params = {"conv0": conv(3, 3, 1, 8), "conv1": conv(3, 3, 8, 16),
              "conv2": conv(3, 3, 16, 24), "fc": conv(24, 32)}
    packed = pack_roi_cnn_fused(params)
    roi4 = jnp.asarray(roi)

    def run_full(r):
        return roi_cnn_fused(r, packed, standardize=False, variant="tiled3",
                             interpret=False)

    for stop, tag in ((None, "full"), ("load", "stop=load"),
                      ("norm", "stop=norm")):
        pallas_cnn2._DEBUG_STOP_AFTER = stop
        try:
            ms = timed(run_full, (roi4,))
        finally:
            pallas_cnn2._DEBUG_STOP_AFTER = None
        print(f"  tiled3 {tag:10s}: {ms:6.3f} ms", flush=True)
        out[f"tiled3_{tag}"] = round(ms, 3)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
