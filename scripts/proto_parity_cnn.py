"""Prototype: parity-packed fused conv1+pool1 Pallas kernel.

Design (from the round-2 on-chip profile, build/roi_trace): conv1 writes a
1.2 GB f32 intermediate that pool1 immediately re-reads — 2.2 of the 5.9 ms
f32 ROI-CNN budget. This kernel fuses them with ZERO Mosaic relayouts:

- the input is pre-split in XLA into 4 row classes by h mod 4 (cheap u8
  strided slices), so 2x2 max pooling becomes ELEMENTWISE maxes of class
  outputs — no (R/2,2,L) reshape, no strided slices;
- conv1's weights are packed per w-parity: the same 34-lane patch window
  feeds one matmul producing the 16 even-w outputs of a 32-wide tile and one
  producing the odd-w outputs, so the w-direction pool is also elementwise;
- /255 is folded into the packed weights (conv is linear);
- outputs are 4 compact quadrant arrays; XLA interleaves them back to
  (N, 24, 48, 8) with one fused stack+reshape.

Correctness vs the XLA reference and timing vs the grouped baseline.
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

F = 16            # frames per grid step
HQ = 12           # rows per h-class (48 / 4)
W1 = 96
KP = 104          # padded patch K (3 dy * 34 window -> 102 -> 104)
N_FRAMES = 8192


# ---------------------------------------------------------------------------
# weight packing
# ---------------------------------------------------------------------------

def pack_parity_conv1(k: np.ndarray, b: np.ndarray, scale: float = 1.0 / 255.0):
    """k: (3,3,1,8) HWIO; returns (WE, WO) each (KP, 128) and bias (1, 128).

    Patch lane layout: dy*34 + local, local = (w - 32j) + dx for window
    [32j-1, 32j+32]. Output col = t*8 + co with w = 32j + 2t (+1 for odd).
    """
    k = np.asarray(k, np.float32) * scale
    b = np.asarray(b, np.float32)
    WE = np.zeros((KP, 128), np.float32)
    WO = np.zeros((KP, 128), np.float32)
    for t in range(16):
        for co in range(8):
            col = t * 8 + co
            for dy in range(3):
                for dx in range(3):
                    WE[dy * 34 + 2 * t + dx, col] = k[dy, dx, 0, co]
                    WO[dy * 34 + 2 * t + 1 + dx, col] = k[dy, dx, 0, co]
    bias = np.tile(b, 48)[None, :]  # (1, 384): per (q, co) lane
    return WE, WO, bias


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------

def _kernel(x0_ref, x1_ref, x2_ref, x3_ref, we_ref, wo_ref, b_ref,
            ome_ref, omo_ref,
            halo_ref, patch_ref):
    """One F-frame step.

    x{c}_ref: (F*HQ, 96) u8 rows h = 4k + c.
    ome/omo_ref: (F*HQ, 384) f32 pooled rows m even / m odd — lane layout
    (q, co) with pooled w index q = 16j + t, i.e. the (12, 48, 8) row block.
    halo_ref: (4, F*HQ, 128) haloed f32 class buffers.
    patch_ref: (F*HQ, KP) im2col patch for the current (class, tile).
    """
    M = x0_ref.shape[0]

    xs = []
    for r in (x0_ref, x1_ref, x2_ref, x3_ref):
        xs.append(r[...].astype(jnp.int32).astype(jnp.float32))

    # haloed class buffers: lanes [1:97] hold the 96 input columns
    for c in range(4):
        halo_ref[c] = jnp.zeros_like(halo_ref[c])
        halo_ref[c, :, 1:97] = xs[c]

    # dy views per class: rows h-1, h, h+1 live in neighbor classes;
    # only class edges need a roll + frame mask (h grid HQ per class)
    kk = jax.lax.broadcasted_iota(jnp.int32, (M, 1), 0) % HQ
    x3d = pltpu.roll(halo_ref[3], 1, axis=0)       # x3[k-1]
    x3d = jnp.where(kk == 0, 0.0, x3d)
    x0u = pltpu.roll(halo_ref[0], M - 1, axis=0)   # x0[k+1]
    x0u = jnp.where(kk == HQ - 1, 0.0, x0u)

    views = [
        (x3d, halo_ref[0][...], halo_ref[1][...]),          # class 0
        (halo_ref[0][...], halo_ref[1][...], halo_ref[2][...]),
        (halo_ref[1][...], halo_ref[2][...], halo_ref[3][...]),
        (halo_ref[2][...], halo_ref[3][...], x0u),          # class 3
    ]

    bias = b_ref[...]
    patch_ref[:, 102:] = jnp.zeros_like(patch_ref[:, 102:])
    for out_ref, (ca, cb) in ((ome_ref, (0, 1)), (omo_ref, (2, 3))):
        for c in (ca, cb):
            for j in range(3):
                for dy in range(3):
                    patch_ref[:, dy * 34: dy * 34 + 34] = (
                        views[c][dy][:, 32 * j: 32 * j + 34]
                    )
                p = patch_ref[...]
                ye = jnp.dot(p, we_ref[...],
                             preferred_element_type=jnp.float32)
                yo = jnp.dot(p, wo_ref[...],
                             preferred_element_type=jnp.float32)
                m = jnp.maximum(ye, yo)  # pool over the w pair (2q, 2q+1)
                sl = slice(128 * j, 128 * (j + 1))
                if c == ca:
                    out_ref[:, sl] = m
                else:
                    out_ref[:, sl] = jnp.maximum(out_ref[:, sl], m)
        # relu(max) == max(relu); bias folded in after the max (bias is
        # constant across the pooled pair so max commutes with +bias)
        out_ref[...] = jnp.maximum(out_ref[...] + bias, 0.0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def conv1pool1_parity(x0, x1, x2, x3, WE, WO, bias, *, interpret=False):
    """x{c}: (N, HQ, 96) u8 (rows h=4k+c). Returns 4 quadrant arrays
    (N*HQ, 192) f32: (m-even,w-even), (m-even,w-odd), (m-odd,w-even),
    (m-odd,w-odd) where pooled1[m, w] has m=2k+mp, w=2q+wp."""
    N = x0.shape[0]
    grid = (N // F,)
    spec_in = pl.BlockSpec((F * HQ, W1), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    spec_w = pl.BlockSpec((KP, 128), lambda i: (0, 0), memory_space=pltpu.VMEM)
    spec_b = pl.BlockSpec((1, 384), lambda i: (0, 0), memory_space=pltpu.VMEM)
    spec_out = pl.BlockSpec((F * HQ, 384), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[spec_in] * 4 + [spec_w, spec_w, spec_b],
        out_specs=[spec_out] * 2,
        out_shape=[jax.ShapeDtypeStruct((N * HQ, 384), jnp.float32)] * 2,
        scratch_shapes=[
            pltpu.VMEM((4, F * HQ, 128), jnp.float32),
            pltpu.VMEM((F * HQ, KP), jnp.float32),
        ],
        interpret=interpret,
    )(x0.reshape(N * HQ, W1), x1.reshape(N * HQ, W1),
      x2.reshape(N * HQ, W1), x3.reshape(N * HQ, W1), WE, WO, bias)
    return outs


def pooled1_from_quadrants(qs, N):
    """2x (N*HQ, 384) m-parity halves -> (N, 24, 48, 8) by stack+reshape."""
    me, mo = (q.reshape(N, HQ, 48, 8) for q in qs)
    return jnp.stack([me, mo], axis=2).reshape(N, 24, 48, 8)  # m interleave


# ---------------------------------------------------------------------------
# reference + timing
# ---------------------------------------------------------------------------

def ref_conv1pool1(roi_u8, k, b):
    x = roi_u8.astype(jnp.float32)[..., None] / 255.0
    y = lax.conv_general_dilated(
        x, k.astype(jnp.float32), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
    y = jax.nn.relu(y)
    return lax.reduce_window(y, -jnp.inf, lax.max,
                             (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


def timed(fn, *args, iters=30):
    """In-graph scan timing; runtime-zero u8 feedback keeps iterations live
    without a large f32 elementwise add polluting the measurement."""

    @functools.partial(jax.jit, static_argnames=("n",))
    def loop2(a_u8, rest, n):
        def body(c, _):
            out = fn(*[x + c for x in a_u8], *rest)
            olist = out if isinstance(out, (list, tuple)) else [out]
            s = sum(jnp.sum(o[:1, :1]) for o in olist)
            return (s * 1e-30).astype(jnp.uint8), s
        c, outs = lax.scan(body, jnp.uint8(0), None, length=n)
        return outs[-1]

    u8s = [a for a in args if a.dtype == jnp.uint8]
    rest = [a for a in args if a.dtype != jnp.uint8]
    float(loop2(u8s, rest, 2))
    float(loop2(u8s, rest, iters))
    t0 = time.perf_counter()
    float(loop2(u8s, rest, iters))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    rng = np.random.default_rng(0)
    interpret = jax.default_backend() not in ("tpu",)
    n_check = 64 if interpret else N_FRAMES  # interpret mode is slow
    roi = rng.integers(0, 256, (n_check, 48, 96), dtype=np.uint8)
    k = rng.standard_normal((3, 3, 1, 8)).astype(np.float32) * 0.3
    b = rng.standard_normal(8).astype(np.float32) * 0.1

    WE, WO, bias = pack_parity_conv1(k, b)
    roi_j = jnp.asarray(roi)
    xs = [jnp.asarray(roi[:, c::4].copy()) for c in range(4)]

    qs = conv1pool1_parity(*xs, jnp.asarray(WE), jnp.asarray(WO),
                           jnp.asarray(bias), interpret=interpret)
    got = np.asarray(jax.jit(pooled1_from_quadrants, static_argnums=1)(
        qs, n_check))
    want = np.asarray(ref_conv1pool1(roi_j, jnp.asarray(k), jnp.asarray(b)))
    err = np.abs(got - want).max()
    # on TPU both paths use default (bf16) matmul precision and round
    # differently; exactness is pinned on CPU (tests)
    tol = 2e-2 if jax.default_backend() == "tpu" else 1e-4
    print(f"correctness: max|err| = {err:.2e} (tol {tol})")
    assert err < tol

    if jax.default_backend() == "tpu":
        roi = rng.integers(0, 256, (N_FRAMES, 48, 96), dtype=np.uint8)
        roi_j = jnp.asarray(roi)
        xs = [jnp.asarray(roi[:, c::4].copy()) for c in range(4)]

        def fused(x0, x1, x2, x3, WEj, WOj, biasj):
            qs = conv1pool1_parity(x0, x1, x2, x3, WEj, WOj, biasj)
            return pooled1_from_quadrants(qs, N_FRAMES)

        def split_then_fused(roi, WEj, WOj, biasj):
            parts = [roi[:, c::4] for c in range(4)]
            qs = conv1pool1_parity(*parts, WEj, WOj, biasj)
            return pooled1_from_quadrants(qs, N_FRAMES)

        t_ref = timed(lambda r, kk, bb: ref_conv1pool1(r, kk, bb),
                      roi_j, jnp.asarray(k), jnp.asarray(b))
        t_k = timed(fused, *xs, jnp.asarray(WE), jnp.asarray(WO),
                    jnp.asarray(bias))
        t_e2e = timed(split_then_fused, roi_j, jnp.asarray(WE),
                      jnp.asarray(WO), jnp.asarray(bias))
        print(f"XLA conv1+pool1 reference : {t_ref:6.2f} ms / {N_FRAMES} fr")
        print(f"parity kernel (pre-split) : {t_k:6.2f} ms")
        print(f"parity kernel (incl split): {t_e2e:6.2f} ms")


if __name__ == "__main__":
    main()
