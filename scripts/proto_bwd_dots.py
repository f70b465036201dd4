"""Mosaic feasibility probe for the fused-CNN backward kernel's dot shapes.

The backward needs two dot forms the forward never uses:
  1. dW += p^T @ dy  — contract the SUBLANE (M) axis of two VMEM operands
     (dot_general (((0,), (0,)), ((), ()))), accumulated across grid steps.
  2. dp = dy @ W^T   — avoided by passing a pre-transposed weight operand,
     so it is a plain matmul; probed anyway via dimension_numbers
     (((1,), (1,)), ((), ())) in case passing W^T ever becomes awkward.

Run on TPU: checks compile + correctness at the exact backward shapes
(M=192/384, K=512, N=256) and prints rough rates.
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel_tt(p_ref, dy_ref, out_ref):
    # dW = p^T @ dy, accumulated over grid steps
    acc = jax.lax.dot_general(
        p_ref[...], dy_ref[...],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        out_ref[...] = acc

    @pl.when(pl.program_id(0) != 0)
    def _acc():
        out_ref[...] = out_ref[...] + acc


def _kernel_nt(dy_ref, w_ref, out_ref):
    # dp = dy @ w^T (rhs-transposed)
    out_ref[...] = jax.lax.dot_general(
        dy_ref[...], w_ref[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("m", "interpret"))
def run_tt(p, dy, m, interpret):
    G = p.shape[0] // m
    return pl.pallas_call(
        _kernel_tt,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((m, p.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, dy.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((p.shape[1], dy.shape[1]), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((p.shape[1], dy.shape[1]),
                                       jnp.float32),
        interpret=interpret,
    )(p, dy)


@functools.partial(jax.jit, static_argnames=("m", "interpret"))
def run_nt(dy, w, m, interpret):
    G = dy.shape[0] // m
    return pl.pallas_call(
        _kernel_nt,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((m, dy.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, w.shape[0]), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((dy.shape[0], w.shape[0]),
                                       jnp.float32),
        interpret=interpret,
    )(dy, w)


def main():
    interpret = jax.devices()[0].platform != "tpu"
    print("interpret:", interpret)
    rng = np.random.default_rng(0)
    for M, K, N, rows in ((192, 104, 256, 8192 * 12), (384, 512, 256, 8192 * 12),
                          (384, 256, 512, 8192 * 12)):
        p = jnp.asarray(rng.standard_normal((rows, K)), jnp.float32)
        dy = jnp.asarray(rng.standard_normal((rows, N)), jnp.float32)
        ref = np.asarray(p).T @ np.asarray(dy)
        t0 = time.perf_counter()
        out = np.asarray(run_tt(p, dy, M, interpret))
        t1 = time.perf_counter()
        err = np.abs(out - ref).max() / max(1.0, np.abs(ref).max())
        # warm rate
        for _ in range(3):
            out2 = run_tt(p, dy, M, interpret)
        np.asarray(out2)
        t2 = time.perf_counter()
        dt = (t2 - t1) / 3
        macs = rows * K * N
        print(f"tt  M={M} K={K} N={N}: rel_err={err:.2e} "
              f"first={t1-t0:.2f}s warm={dt*1e3:.2f}ms "
              f"rate={macs/dt/1e12:.1f} T MAC/s")

        w = jnp.asarray(rng.standard_normal((K, N)), jnp.float32)
        ref2 = np.asarray(dy) @ np.asarray(w).T
        t0 = time.perf_counter()
        o = np.asarray(run_nt(dy, w, M, interpret))
        t1 = time.perf_counter()
        err2 = np.abs(o - ref2).max() / max(1.0, np.abs(ref2).max())
        for _ in range(3):
            o2 = run_nt(dy, w, M, interpret)
        np.asarray(o2)
        t2 = time.perf_counter()
        dt = (t2 - t1) / 3
        macs = rows * K * N
        print(f"nt  M={M} K={K} N={N}: rel_err={err2:.2e} "
              f"first={t1-t0:.2f}s warm={dt*1e3:.2f}ms "
              f"rate={macs/dt/1e12:.1f} T MAC/s")


if __name__ == "__main__":
    main()
