"""Mosaic primitive micro-benchmarks for the ROI-CNN kernel redesign.

Times individual in-VMEM operations at the pallas_cnn working set
((768, 768) f32 per grid step, 512 steps = the 8192-frame batch) so kernel
design decisions stop being blind (VERDICT r1 item 2).
"""

from __future__ import annotations

import functools
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, L = 768, 768
STEPS = 512
ITERS = 30


def _mk(body, out_rows=R):
    """pallas_call over (STEPS,) grid; in/out (R, L)/(out_rows, L) blocks."""

    def kernel(x_ref, o_ref):
        body(x_ref, o_ref)

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            grid=(STEPS,),
            in_specs=[pl.BlockSpec((R, L), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((out_rows, L), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((STEPS * out_rows, L), jnp.float32),
        )(x)

    return run


def timed(run, x, iters=ITERS):
    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(x, n):
        def bd(c, _):
            y = run.__wrapped__(c) if hasattr(run, "__wrapped__") else run(c)
            return c + y[0, 0] * 1e-30, y[0, 0]
        c, outs = lax.scan(bd, x, None, length=n)
        return outs[-1] + c[0, 0]

    float(loop(x, 2))
    float(loop(x, iters))
    t0 = time.perf_counter()
    float(loop(x, iters))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((STEPS * R, L)).astype(np.float32))

    cases = {}

    def copy(x_ref, o_ref):
        o_ref[...] = x_ref[...]
    cases["copy"] = (_mk(copy), R)

    def reshape_max_pool(x_ref, o_ref):
        v = x_ref[...]
        o_ref[...] = jnp.max(v.reshape(R // 2, 2, L), axis=1)
    cases["rows_reshape_max"] = (_mk(reshape_max_pool, R // 2), R // 2)

    def roll_max_lanes(x_ref, o_ref):
        v = x_ref[...]
        o_ref[...] = jnp.maximum(v, pltpu.roll(v, L - 8, axis=1))
    cases["lanes_roll_max"] = (_mk(roll_max_lanes), R)

    def roll_max_rows(x_ref, o_ref):
        v = x_ref[...]
        o_ref[...] = jnp.maximum(v, pltpu.roll(v, R - 1, axis=0))
    cases["rows_roll_max"] = (_mk(roll_max_rows), R)

    def strided_rows(x_ref, o_ref):
        o_ref[...] = x_ref[...][::2]
    cases["rows_strided_slice"] = (_mk(strided_rows, R // 2), R // 2)

    def transpose(x_ref, o_ref):
        o_ref[...] = x_ref[...].T
    cases["transpose"] = (_mk(transpose), R)

    def unaligned_slices(x_ref, o_ref):
        v = x_ref[...]
        for j in range(6):
            o_ref[:, 128 * j: 128 * j + 18] = v[:, 16 * j: 16 * j + 18]
    cases["unaligned_18lane_x6"] = (_mk(unaligned_slices), R)

    def aligned_slices(x_ref, o_ref):
        v = x_ref[...]
        for j in range(6):
            o_ref[:, 128 * j: 128 * (j + 1)] = v[:, 128 * j: 128 * (j + 1)]
    cases["aligned_128lane_x6"] = (_mk(aligned_slices), R)

    def matmul_512x128(x_ref, o_ref):
        v = x_ref[...]
        o_ref[:, :128] = jnp.dot(v[:, :512], v[:512, :128],
                                 preferred_element_type=jnp.float32)
        o_ref[:, 128:] = v[:, 128:]
    cases["matmul_768x512x128"] = (_mk(matmul_512x128), R)

    for name, (run, out_rows) in cases.items():
        try:
            ms = timed(run, x)
            print(f"{name:>22}: {ms:7.3f} ms / {STEPS} steps")
        except Exception as e:  # noqa: BLE001
            msg = str(e).splitlines()[0][:120]
            print(f"{name:>22}: FAILED {type(e).__name__}: {msg}")


if __name__ == "__main__":
    main()
