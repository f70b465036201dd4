"""MXU rate of the lhs-transposed dot on VMEM-RESIDENT operands.

The backward kernel's dW dots contract recomputed VMEM tensors — no HBM
streaming (probe 2 measured streaming-bound ~30 GB/s, which mis-modeled
the use case). Here the operand blocks are CONSTANT across a 256-step grid
(loaded once), so per-step time is pure dot + accumulate.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

STEPS = 512


def _acc(out_ref, v):
    @pl.when(pl.program_id(0) == 0)
    def _i():
        out_ref[...] = v

    @pl.when(pl.program_id(0) != 0)
    def _a():
        out_ref[...] = out_ref[...] + v


def _k_tt(p_ref, dy_ref, out_ref):
    _acc(out_ref, jax.lax.dot_general(
        p_ref[...], dy_ref[...],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32))


def _k_nn(p_ref, dy_ref, out_ref):
    # normal dot baseline: (K, M) x (M, N) — same MACs, standard form
    _acc(out_ref, jnp.dot(p_ref[...], dy_ref[...],
                          preferred_element_type=jnp.float32))


def _make(kernel, a_shape, b_shape, out_shape):
    f = pl.pallas_call(
        kernel,
        grid=(STEPS,),
        in_specs=[
            pl.BlockSpec(a_shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(b_shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(out_shape, lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )
    return jax.jit(f)


def bench(tag, f, a, b, macs_per_step):
    np.asarray(f(a, b))
    t1 = time.perf_counter()
    for _ in range(5):
        o = f(a, b)
    np.asarray(o)
    dt = (time.perf_counter() - t1) / 5
    per_step = dt / STEPS
    print(f"{tag}: {per_step*1e6:.1f} us/step "
          f"rate={macs_per_step/per_step/1e12:.1f} T MAC/s")


def main():
    rng = np.random.default_rng(0)
    for M, K, N in ((384, 512, 256), (384, 104, 256), (384, 256, 512)):
        p = jnp.asarray(rng.standard_normal((M, K)), jnp.float32)
        dy = jnp.asarray(rng.standard_normal((M, N)), jnp.float32)
        f = _make(_k_tt, (M, K), (M, N), (K, N))
        bench(f"tt M={M} K={K} N={N}", f, p, dy, M * K * N)
        pk = jnp.asarray(rng.standard_normal((K, M)), jnp.float32)
        f2 = _make(_k_nn, (K, M), (M, N), (K, N))
        bench(f"nn      (K,M)x(M,N)   ", f2, pk, dy, M * K * N)


if __name__ == "__main__":
    main()
