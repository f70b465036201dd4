"""MXU-rate probe: does int8 arithmetic double the fused CNN's dot rate?

docs/ROI_CNN_PERF.md round-5 closed the fused kernel as MXU-bound: the
dots-only chain runs 78.8 T MAC/s f32-at-default (~80% of the chip's bf16
peak), stages at 64-69. The one rate lever never measured is the MXU's
int8 mode (v5e datasheet: 394 TOPS int8 vs 197 bf16 — a 2x ceiling), and
the ROI input stream is ALREADY u8 integers, so a quantized serving mode
would pay no input-conversion tax.

This probe answers the gating question with the same overlap_b-style
chained-dot kernel as scripts/probe_front.py, at the kernel's real tile
shapes: a serial chain of DEPTH (M, K)x(K, K) dots per grid step,
M = F_TILE*12 = 384, K in {384, 512} (the stage-2/3 tile contraction is
512). Modes:

  f32    — y=dot(y,w) in f32 at default precision (the shipped kernel's
           mode; reproduces the 78.8 T MAC/s reference row)
  bf16   — chain held in bf16 (preferred_element_type=bf16)
  int8   — s8 x s8 -> s32 dots; the chain re-narrows via (acc >> 7) -> s8
           (the re-pack is VPU work a real kernel would also pay between
           stages)
  int8i  — int8 dots WITHOUT the chain re-pack: DEPTH dots of (w+seed)@w
           summed in s32 — isolates the pure MXU s8 rate from the
           narrowing cost

If int8/int8i land near 2x f32, a quantized fused-CNN serving mode is a
real candidate (per-channel weight scales, u8 activations native); if
they land at ~1x, Mosaic is widening s8 to bf16 on the MXU and the line
retires with this table.

Run on the real chip: python scripts/probe_int8.py
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

GRID = 256          # grid steps, matches probe_front (8192 frames / F_TILE=32)
DEPTH = 14          # chained dots per step, matches probe_front's overlap_b
M = 384             # F_TILE * 12 — the shipped kernel's matmul-row tile
ITERS = 50


def _kernel(mode: str, K: int, x_ref, o_ref, w_ref):
    # seed from the streamed block so Mosaic cannot hoist the chain out of
    # the grid loop (u8 scalar extracts don't lower — widen via i32)
    seed_i = jnp.sum(x_ref[...].astype(jnp.int32))
    if mode == "f32":
        y = jnp.zeros((M, K), jnp.float32) + seed_i.astype(jnp.float32) * 1e-6
        for _ in range(DEPTH):
            y = jnp.dot(y, w_ref[...], preferred_element_type=jnp.float32)
        o_ref[...] = jnp.zeros_like(o_ref) + jnp.sum(y[0:1, 0:128])
        return
    if mode == "bf16":
        y = (jnp.zeros((M, K), jnp.bfloat16)
             + (seed_i.astype(jnp.float32) * 1e-6).astype(jnp.bfloat16))
        for _ in range(DEPTH):
            y = jnp.dot(y, w_ref[...], preferred_element_type=jnp.bfloat16)
        o_ref[...] = (jnp.zeros_like(o_ref)
                      + jnp.sum(y[0:1, 0:128].astype(jnp.float32)))
        return
    if mode == "int8":
        y = ((jnp.zeros((M, K), jnp.int32) + (seed_i & 63))
             .astype(jnp.int8))
        for _ in range(DEPTH):
            acc = jnp.dot(y, w_ref[...], preferred_element_type=jnp.int32)
            y = (acc >> 7).astype(jnp.int8)
        o_ref[...] = (jnp.zeros_like(o_ref)
                      + jnp.sum(y[0:1, 0:128].astype(jnp.float32)))
        return
    # int8i: DEPTH independent s8 dots, s32 accumulation, no re-narrowing
    acc = jnp.zeros((M, K), jnp.int32)
    base = ((jnp.zeros((M, K), jnp.int32) + (seed_i & 63)).astype(jnp.int8))
    for d in range(DEPTH):
        xd = base + jnp.int8(d)
        acc = acc + jnp.dot(xd, w_ref[...], preferred_element_type=jnp.int32)
    o_ref[...] = (jnp.zeros_like(o_ref)
                  + jnp.sum(acc[0:1, 0:128].astype(jnp.float32)))


def build(mode: str, K: int):
    wdtype = {"f32": jnp.float32, "bf16": jnp.bfloat16,
              "int8": jnp.int8, "int8i": jnp.int8}[mode]
    return pl.pallas_call(
        functools.partial(_kernel, mode, K),
        grid=(GRID,),
        in_specs=[pl.BlockSpec((8, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((GRID, 8, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((K, K), wdtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )


def timed(fn, args, iters=ITERS):
    """Chained-scan on-chip timing (same harness as probe_front)."""

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
    x = jnp.asarray(rng.integers(0, 256, (GRID * 8, 128), dtype=np.uint8))

    out = {}
    for K in (384, 512):
        macs = GRID * DEPTH * M * K * K
        print(f"== chained (M={M}, K={K})x(K, K) dots, DEPTH={DEPTH}, "
              f"grid={GRID} ({macs / 1e9:.0f} G MACs) ==", flush=True)
        base = None
        for mode in ("f32", "bf16", "int8", "int8i"):
            try:
                ms = timed(build(mode, K), (x,))
            except Exception as e:  # noqa: BLE001 — report unsupported lowerings
                print(f"  {mode:6s}: UNSUPPORTED ({type(e).__name__}: "
                      f"{str(e).splitlines()[0][:120]})", flush=True)
                out[f"{mode}_k{K}"] = None
                continue
            rate = macs / (ms * 1e-3) / 1e12
            note = "" if base is None else f"  ({base / ms:.2f}x vs f32)"
            if mode == "f32":
                base = ms
            print(f"  {mode:6s}: {ms:6.3f} ms  {rate:6.1f} T MAC/s{note}",
                  flush=True)
            out[f"{mode}_k{K}"] = round(ms, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
