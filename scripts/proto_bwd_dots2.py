"""Isolate WHY the lhs-transposed dot (dW = p^T dy) ran at 1 T MAC/s.

Variants, all computing the same (K, N) accumulation over row tiles:
  base : normal dot p @ w at the same grid (per-step overhead baseline)
  tt   : dot_general contracting dim0/dim0 (the round-1 probe form)
  xp   : explicit jnp.swapaxes(p) then normal dot
  tall : tt with 8x taller tiles (amortize per-step cost)
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _acc_out(out_ref, acc):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        out_ref[...] = acc

    @pl.when(pl.program_id(0) != 0)
    def _add():
        out_ref[...] = out_ref[...] + acc


def _k_base(p_ref, w_ref, out_ref):
    y = jnp.dot(p_ref[...], w_ref[...], preferred_element_type=jnp.float32)
    # accumulate a (1, N) colsum so the out write is cheap but live
    _acc_out(out_ref, jnp.sum(y, axis=0, keepdims=True))


def _k_tt(p_ref, dy_ref, out_ref):
    acc = jax.lax.dot_general(
        p_ref[...], dy_ref[...],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    _acc_out(out_ref, acc)


def _k_xp(p_ref, dy_ref, out_ref):
    pt = jnp.swapaxes(p_ref[...], 0, 1)
    acc = jnp.dot(pt, dy_ref[...], preferred_element_type=jnp.float32)
    _acc_out(out_ref, acc)


def _make(kernel, a_shape, b_shape, m, out_shape, a_follows_grid=True):
    G = a_shape[0] // m

    def bspec(shape, grid_rows):
        if grid_rows:
            return pl.BlockSpec((m, shape[1]), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
        return pl.BlockSpec(shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    f = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[bspec(a_shape, True), bspec(b_shape, a_follows_grid)],
        out_specs=pl.BlockSpec(out_shape, lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )
    return jax.jit(f)


def bench(tag, f, a, b, macs):
    o = np.asarray(f(a, b))  # compile + first
    t1 = time.perf_counter()
    for _ in range(5):
        o2 = f(a, b)
    np.asarray(o2)
    dt = (time.perf_counter() - t1) / 5
    print(f"{tag}: warm={dt*1e3:.2f}ms rate={macs/dt/1e12:.1f} T MAC/s")
    return o


def main():
    rng = np.random.default_rng(0)
    rows, K, N = 8192 * 12, 512, 256
    p = jnp.asarray(rng.standard_normal((rows, K)), jnp.float32)
    dy = jnp.asarray(rng.standard_normal((rows, N)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((K, N)), jnp.float32)
    macs = rows * K * N

    for m in (384, 1536):
        f = _make(_k_base, p.shape, w.shape, m, (1, N), a_follows_grid=False)
        bench(f"base M={m} (p@w, colsum out)", f, p, w, macs)
    for m in (384, 1536, 3072):
        f = _make(_k_tt, p.shape, dy.shape, m, (K, N))
        bench(f"tt   M={m}", f, p, dy, macs)
    for m in (384, 1536):
        f = _make(_k_xp, p.shape, dy.shape, m, (K, N))
        bench(f"xp   M={m} (swapaxes+dot)", f, p, dy, macs)


if __name__ == "__main__":
    main()
