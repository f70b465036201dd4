"""Ablation timing of the parity conv1+pool1 kernel stages (wrong results OK —
this isolates where the 20 ms goes)."""

from __future__ import annotations

import functools
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F, HQ, W1, KP = 16, 12, 96, 104
N = 8192


def make_kernel(mode):
    def _kernel(x0_ref, x1_ref, x2_ref, x3_ref, we_ref, wo_ref, b_ref,
                ome_ref, omo_ref, halo_ref, patch_ref):
        M = x0_ref.shape[0]
        if mode == "io_only":
            ome_ref[...] = jnp.zeros_like(ome_ref)
            omo_ref[...] = jnp.zeros_like(omo_ref)
            return
        xs = [r[...].astype(jnp.int32).astype(jnp.float32)
              for r in (x0_ref, x1_ref, x2_ref, x3_ref)]
        if mode == "widen_only":
            ome_ref[...] = jnp.zeros_like(ome_ref) + jnp.sum(xs[0][:1, :1])
            omo_ref[...] = jnp.zeros_like(omo_ref)
            return
        for c in range(4):
            halo_ref[c] = jnp.zeros_like(halo_ref[c])
            if mode != "halo_aligned":
                halo_ref[c, :, 1:97] = xs[c]
            else:
                halo_ref[c, :, 0:96] = xs[c]
        if mode in ("halo_only", "halo_aligned"):
            ome_ref[...] = jnp.zeros_like(ome_ref) + halo_ref[0, 0, 0]
            omo_ref[...] = jnp.zeros_like(omo_ref)
            return
        kk = jax.lax.broadcasted_iota(jnp.int32, (M, 1), 0) % HQ
        x3d = jnp.where(kk == 0, 0.0, pltpu.roll(halo_ref[3], 1, axis=0))
        x0u = jnp.where(kk == HQ - 1, 0.0, pltpu.roll(halo_ref[0], M - 1, axis=0))
        views = [
            (x3d, halo_ref[0][...], halo_ref[1][...]),
            (halo_ref[0][...], halo_ref[1][...], halo_ref[2][...]),
            (halo_ref[1][...], halo_ref[2][...], halo_ref[3][...]),
            (halo_ref[2][...], halo_ref[3][...], x0u),
        ]
        bias = b_ref[...]
        patch_ref[:, 102:] = jnp.zeros_like(patch_ref[:, 102:])
        for out_ref, (ca, cb) in ((ome_ref, (0, 1)), (omo_ref, (2, 3))):
            for c in (ca, cb):
                for j in range(3):
                    if mode != "no_patch":
                        for dy in range(3):
                            if mode == "patch_aligned":
                                patch_ref[:, dy * 32: dy * 32 + 32] = (
                                    views[c][dy][:, 32 * j: 32 * j + 32])
                            else:
                                patch_ref[:, dy * 34: dy * 34 + 34] = (
                                    views[c][dy][:, 32 * j: 32 * j + 34])
                    if mode == "no_dot":
                        m = patch_ref[:, :128] + 0.0
                    else:
                        p = patch_ref[...]
                        ye = jnp.dot(p, we_ref[...],
                                     preferred_element_type=jnp.float32)
                        yo = jnp.dot(p, wo_ref[...],
                                     preferred_element_type=jnp.float32)
                        m = jnp.maximum(ye, yo)
                    sl = slice(128 * j, 128 * (j + 1))
                    if c == ca:
                        out_ref[:, sl] = m
                    else:
                        out_ref[:, sl] = jnp.maximum(out_ref[:, sl], m)
            out_ref[...] = jnp.maximum(out_ref[...] + bias, 0.0)
    return _kernel


@functools.partial(jax.jit, static_argnames=("mode",))
def run(x0, x1, x2, x3, WE, WO, bias, mode="full"):
    spec_in = pl.BlockSpec((F * HQ, W1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    spec_w = pl.BlockSpec((KP, 128), lambda i: (0, 0), memory_space=pltpu.VMEM)
    spec_b = pl.BlockSpec((1, 384), lambda i: (0, 0), memory_space=pltpu.VMEM)
    spec_out = pl.BlockSpec((F * HQ, 384), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        make_kernel(mode),
        grid=(N // F,),
        in_specs=[spec_in] * 4 + [spec_w, spec_w, spec_b],
        out_specs=[spec_out] * 2,
        out_shape=[jax.ShapeDtypeStruct((N * HQ, 384), jnp.float32)] * 2,
        scratch_shapes=[pltpu.VMEM((4, F * HQ, 128), jnp.float32),
                        pltpu.VMEM((F * HQ, KP), jnp.float32)],
    )(x0, x1, x2, x3, WE, WO, bias)


def timed(mode, args, iters=30):
    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(u8s, rest, n):
        def body(c, _):
            out = run(*[x + c for x in u8s], *rest, mode=mode)
            return (jnp.sum(out[0][:1, :1]) * 1e-30).astype(jnp.uint8), out[0][0, 0]
        _, outs = lax.scan(body, jnp.uint8(0), None, length=n)
        return outs[-1]

    u8s, rest = args[:4], args[4:]
    float(loop(u8s, rest, 2))
    float(loop(u8s, rest, iters))
    t0 = time.perf_counter()
    float(loop(u8s, rest, iters))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    rng = np.random.default_rng(0)
    xs = [jnp.asarray(rng.integers(0, 256, (N * HQ, W1), dtype=np.uint8))
          for _ in range(4)]
    WE = jnp.asarray(rng.standard_normal((KP, 128)).astype(np.float32))
    WO = jnp.asarray(rng.standard_normal((KP, 128)).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal((1, 384)).astype(np.float32))
    args = (*xs, WE, WO, bias)
    for mode in ("io_only", "widen_only", "halo_aligned", "halo_only",
                 "no_patch", "no_dot", "patch_aligned", "full"):
        try:
            print(f"{mode:>14}: {timed(mode, args):7.2f} ms")
        except Exception as e:  # noqa: BLE001
            print(f"{mode:>14}: FAILED {str(e).splitlines()[0][:90]}")


if __name__ == "__main__":
    main()
