"""Prototype: multi-timestep Pallas GRU + fused-direction wrapper.

Variants measured here (vs ops/gru.py scan and ops/pallas_gru.py v1):
  A. K-step grid blocks: grid=(Bt, T/K), each grid entry runs K unrolled
     GRU steps from one (K, TB, 3H) VMEM block — bigger DMAs, fewer grid
     entries, same bitwise math.
  B. Fused directions: stack [xp_fwd; xp_bwd-of-flipped-x] along batch and
     run ONE kernel per layer instead of two.
  C. bf16 recurrent matmul (carry kept f32 in scratch).

Usage: python scripts/proto_gru2.py [B] [T]
"""

from __future__ import annotations

import sys as _sys, pathlib as _pathlib  # _REPO_ROOT_BOOTSTRAP: run without PYTHONPATH
_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parent.parent))

import functools
import sys
import time
from functools import partial
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from silent_speech_tpu.ops import gru as gru_scan
from silent_speech_tpu.ops import pallas_gru
from silent_speech_tpu.ops.gru import flip_padded

ITERS = 100


def _gru_kstep_kernel(K, cast, len_ref, xp_ref, wh_ref, bh_ref, y_ref, h_scratch):
    tb = pl.program_id(1)

    @pl.when(tb == 0)
    def _():
        h_scratch[:] = jnp.zeros_like(h_scratch)

    h = h_scratch[:]  # (TB, H) f32
    H = h.shape[-1]
    L = len_ref[:, 0]  # (TB,)
    wh = wh_ref[:]
    bh = bh_ref[0, :]
    for k in range(K):
        t = tb * K + k
        xp_t = xp_ref[k]  # (TB, 3H)
        hp = (
            jnp.dot(cast(h), cast(wh), preferred_element_type=jnp.float32)
            + bh
        )
        xr, xz, xn = xp_t[:, :H], xp_t[:, H : 2 * H], xp_t[:, 2 * H :]
        hr, hz, hn = hp[:, :H], hp[:, H : 2 * H], hp[:, 2 * H :]
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        h_new = (1.0 - z) * n + z * h
        valid = (L > t)[:, None]
        h = jnp.where(valid, h_new, h)
        y_ref[k] = jnp.where(valid, h, jnp.zeros_like(h))
    h_scratch[:] = h


@functools.partial(
    jax.jit, static_argnames=("batch_tile", "k_steps", "bf16_mm", "interpret")
)
def gru_sequence_kstep(
    xp: jnp.ndarray,
    lengths: jnp.ndarray,
    wh: jnp.ndarray,
    bh: jnp.ndarray,
    *,
    batch_tile: int = 256,
    k_steps: int = 8,
    bf16_mm: bool = False,
    interpret: Optional[bool] = None,
):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, T, H3 = xp.shape
    H = H3 // 3
    TB = min(batch_tile, B)
    B_pad = -(-B // TB) * TB
    K = min(k_steps, T)
    T_pad = -(-T // K) * K
    if B_pad != B or T_pad != T:
        xp = jnp.pad(xp, ((0, B_pad - B), (0, T_pad - T), (0, 0)))
        lengths = jnp.pad(lengths, (0, B_pad - B))
    len2d = lengths.astype(jnp.int32).reshape(-1, 1)
    xp_tm = xp.swapaxes(0, 1)  # (T_pad, B_pad, 3H)

    cast = (lambda a: a.astype(jnp.bfloat16)) if bf16_mm else (lambda a: a)
    y_tm = pl.pallas_call(
        partial(_gru_kstep_kernel, K, cast),
        grid=(B_pad // TB, T_pad // K),
        in_specs=[
            pl.BlockSpec((TB, 1), lambda i, t: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, TB, H3), lambda i, t: (t, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H3), lambda i, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H3), lambda i, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (K, TB, H), lambda i, t: (t, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((T_pad, B_pad, H), jnp.float32),
        scratch_shapes=[pltpu.VMEM((TB, H), jnp.float32)],
        interpret=interpret,
    )(len2d, xp_tm.astype(jnp.float32), wh.astype(jnp.float32),
      bh.astype(jnp.float32).reshape(1, -1))
    return y_tm.swapaxes(0, 1)[:B, :T]


def bigru_fused(x, lengths, layers, *, batch_tile=256, k_steps=8,
                bf16_mm=False, interpret=None):
    """Stacked biGRU: one kernel per layer (directions stacked along batch)."""
    out = x
    for lp in layers:
        xf = out
        xb = flip_padded(out, lengths)
        dt = out.dtype
        xp_f = (
            jnp.einsum("btd,dh->bth", xf, lp["fwd"]["wi"].astype(dt))
            + lp["fwd"]["bi"].astype(dt)
        )
        xp_b = (
            jnp.einsum("btd,dh->bth", xb, lp["bwd"]["wi"].astype(dt))
            + lp["bwd"]["bi"].astype(dt)
        )
        xp2 = jnp.concatenate([xp_f, xp_b], axis=0)  # (2B, T, 3H)
        len2 = jnp.concatenate([lengths, lengths], axis=0)
        wh2 = jnp.stack([lp["fwd"]["wh"], lp["bwd"]["wh"]])  # (2, H, 3H)
        bh2 = jnp.stack([lp["fwd"]["bh"], lp["bwd"]["bh"]])
        y2 = gru_sequence_kstep_2w(
            xp2, len2, wh2, bh2, batch_tile=batch_tile, k_steps=k_steps,
            bf16_mm=bf16_mm, interpret=interpret,
        )
        B = x.shape[0]
        y_f, y_b = y2[:B], y2[B:]
        y_b = flip_padded(y_b, lengths)
        out = jnp.concatenate([y_f, y_b], axis=-1)
    return out


def _gru_kstep2w_kernel(K, cast, len_ref, xp_ref, wh_ref, bh_ref, y_ref, h_scratch):
    # wh_ref block is (1, H, 3H): the weight for THIS batch tile's direction
    tb = pl.program_id(1)

    @pl.when(tb == 0)
    def _():
        h_scratch[:] = jnp.zeros_like(h_scratch)

    h = h_scratch[:]
    H = h.shape[-1]
    L = len_ref[:, 0]
    wh = wh_ref[0]  # (H, 3H)
    bh = bh_ref[0, 0, :]  # (3H,)
    for k in range(K):
        t = tb * K + k
        xp_t = xp_ref[k]
        hp = (
            jnp.dot(cast(h), cast(wh), preferred_element_type=jnp.float32)
            + bh
        )
        xr, xz, xn = xp_t[:, :H], xp_t[:, H : 2 * H], xp_t[:, 2 * H :]
        hr, hz, hn = hp[:, :H], hp[:, H : 2 * H], hp[:, 2 * H :]
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        h_new = (1.0 - z) * n + z * h
        valid = (L > t)[:, None]
        h = jnp.where(valid, h_new, h)
        y_ref[k] = jnp.where(valid, h, jnp.zeros_like(h))
    h_scratch[:] = h


@functools.partial(
    jax.jit, static_argnames=("batch_tile", "k_steps", "bf16_mm", "interpret")
)
def gru_sequence_kstep_2w(
    xp: jnp.ndarray,
    lengths: jnp.ndarray,
    wh2: jnp.ndarray,  # (2, H, 3H) — fwd then bwd
    bh2: jnp.ndarray,  # (2, 3H)
    *,
    batch_tile: int = 256,
    k_steps: int = 8,
    bf16_mm: bool = False,
    interpret: Optional[bool] = None,
):
    """Like gru_sequence_kstep but rows [0, B/2) use wh2[0], rows [B/2, B) use
    wh2[1]. Requires batch_tile to divide B/2 so a tile never straddles."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, T, H3 = xp.shape
    H = H3 // 3
    half = B // 2
    TB = min(batch_tile, half)
    half_pad = -(-half // TB) * TB
    K = min(k_steps, T)
    T_pad = -(-T // K) * K
    if half_pad != half or T_pad != T:
        pads = half_pad - half
        xp = jnp.concatenate(
            [
                jnp.pad(xp[:half], ((0, pads), (0, T_pad - T), (0, 0))),
                jnp.pad(xp[half:], ((0, pads), (0, T_pad - T), (0, 0))),
            ],
            axis=0,
        )
        lengths = jnp.concatenate(
            [
                jnp.pad(lengths[:half], (0, pads)),
                jnp.pad(lengths[half:], (0, pads)),
            ]
        )
    B_pad = 2 * half_pad
    tiles_per_dir = half_pad // TB
    len2d = lengths.astype(jnp.int32).reshape(-1, 1)
    xp_tm = xp.swapaxes(0, 1)

    cast = (lambda a: a.astype(jnp.bfloat16)) if bf16_mm else (lambda a: a)
    y_tm = pl.pallas_call(
        partial(_gru_kstep2w_kernel, K, cast),
        grid=(B_pad // TB, T_pad // K),
        in_specs=[
            pl.BlockSpec((TB, 1), lambda i, t: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, TB, H3), lambda i, t: (t, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, H, H3),
                lambda i, t, tpd=tiles_per_dir: (i // tpd, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, H3),
                lambda i, t, tpd=tiles_per_dir: (i // tpd, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (K, TB, H), lambda i, t: (t, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((T_pad, B_pad, H), jnp.float32),
        scratch_shapes=[pltpu.VMEM((TB, H), jnp.float32)],
        interpret=interpret,
    )(len2d, xp_tm.astype(jnp.float32),
      wh2.astype(jnp.float32), bh2.astype(jnp.float32).reshape(2, 1, H3))
    y = y_tm.swapaxes(0, 1)
    half0 = xp.shape[0] // 2
    return jnp.concatenate(
        [y[:half0][: B // 2], y[half0:][: B // 2]], axis=0
    )[:, :T]


def timeit(fn, x, iters=ITERS):
    @partial(jax.jit, static_argnames=("n",))
    def loop(x, n):
        def body(carry, _):
            y = fn(carry)
            out = jnp.asarray(y[0, 0, 0], jnp.float32)
            eps = (out * 1e-30).astype(carry.dtype)
            return carry + eps, out

        xf, outs = lax.scan(body, x, None, length=n)
        return outs[-1] + jnp.asarray(xf[0, 0, 0], jnp.float32)

    float(loop(x, 2))
    float(loop(x, iters))
    t0 = time.perf_counter()
    float(loop(x, iters))
    return (time.perf_counter() - t0) / iters


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    H, D, L = 192, 180, 2
    rng = np.random.default_rng(0)

    def dir_params(d):
        return {
            "wi": jnp.asarray(rng.standard_normal((d, 3 * H)), jnp.float32) * 0.05,
            "wh": jnp.asarray(rng.standard_normal((H, 3 * H)), jnp.float32) * 0.05,
            "bi": jnp.zeros((3 * H,), jnp.float32),
            "bh": jnp.zeros((3 * H,), jnp.float32),
        }

    layers = []
    d = D
    for _ in range(L):
        layers.append({"fwd": dir_params(d), "bwd": dir_params(d)})
        d = 2 * H

    x = jnp.asarray(rng.standard_normal((B, T, D)), jnp.float32)
    lengths = jnp.asarray(rng.integers(T // 2, T + 1, (B,)), jnp.int32)

    print(f"B={B} T={T} H={H} layers={L} bidirectional", flush=True)

    y_ref, _ = gru_scan.bigru(x, lengths, layers)

    variants = [
        ("scan", lambda xc: gru_scan.bigru(xc, lengths, layers)[0]),
        ("pallas v1 tb128", lambda xc: pallas_gru.bigru_pallas(xc, lengths, layers)),
        ("fused k1 tb256", lambda xc: bigru_fused(xc, lengths, layers,
                                                  batch_tile=256, k_steps=1)),
        ("fused k4 tb256", lambda xc: bigru_fused(xc, lengths, layers,
                                                  batch_tile=256, k_steps=4)),
        ("fused k8 tb256", lambda xc: bigru_fused(xc, lengths, layers,
                                                  batch_tile=256, k_steps=8)),
        ("fused k8 tb512", lambda xc: bigru_fused(xc, lengths, layers,
                                                  batch_tile=512, k_steps=8)),
        ("fused k16 tb512", lambda xc: bigru_fused(xc, lengths, layers,
                                                   batch_tile=512, k_steps=16)),
        ("fused k32 tb256", lambda xc: bigru_fused(xc, lengths, layers,
                                                   batch_tile=256, k_steps=32)),
        ("fused k8 tb256 bf16mm", lambda xc: bigru_fused(
            xc, lengths, layers, batch_tile=256, k_steps=8, bf16_mm=True)),
    ]
    base = None
    for name, fn in variants:
        try:
            y = fn(x)
            err = float(jnp.max(jnp.abs(jnp.asarray(y) - y_ref)))
            dt = timeit(fn, x)
            if base is None:
                base = dt
            print(f"{name:>24s}: {dt*1e3:8.3f} ms  {base/dt:5.2f}x  err={err:.2e}",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:>24s}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
