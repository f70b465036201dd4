"""Prototype v4: dual-chain Pallas GRU — both directions in ONE kernel,
as separate refs (zero concats), fused in-kernel projections.

Rationale from proto_gru2/3 measurements:
- stacking directions along batch loses to XLA concat copies (0.63x);
- fused projection alone is only 1.14x — the stack is near its matmul floor;
- the remaining lever is instruction-level parallelism: the fwd and bwd
  recurrences are independent chains, so running both in one kernel lets the
  scheduler overlap chain A's VPU gate math with chain B's MXU matmul, and
  halves the number of sequential grid-step chains per layer.

Kernel layout: grid=(B/TB, T/K); inputs x (natural) and x_flipped (both
(K,TB,D) blocks), per-direction weights; two VMEM carry scratches; two
(K,TB,H) outputs. vmem_limit raised via CompilerParams to allow TB>=256.

Usage: python scripts/proto_gru4.py [B] [T]
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


def _cell(h, xp_t, wh, bh, cast):
    H = h.shape[-1]
    hp = jnp.dot(cast(h), cast(wh), preferred_element_type=jnp.float32) + bh
    xr, xz, xn = xp_t[:, :H], xp_t[:, H : 2 * H], xp_t[:, 2 * H :]
    hr, hz, hn = hp[:, :H], hp[:, H : 2 * H], hp[:, 2 * H :]
    r = jax.nn.sigmoid(xr + hr)
    z = jax.nn.sigmoid(xz + hz)
    n = jnp.tanh(xn + r * hn)
    return (1.0 - z) * n + z * h


def _gru_dual_kernel(K, cast, len_ref, xf_ref, xb_ref, wif_ref, bif_ref,
                     wib_ref, bib_ref, whf_ref, bhf_ref, whb_ref, bhb_ref,
                     yf_ref, yb_ref, hf_scratch, hb_scratch):
    tb = pl.program_id(1)

    @pl.when(tb == 0)
    def _():
        hf_scratch[:] = jnp.zeros_like(hf_scratch)
        hb_scratch[:] = jnp.zeros_like(hb_scratch)

    hf = hf_scratch[:]
    hb = hb_scratch[:]
    TB, H = hf.shape
    L = len_ref[:, 0]

    xf_blk = xf_ref[:]  # (K, TB, D)
    xb_blk = xb_ref[:]
    D = xf_blk.shape[-1]
    xpf = (
        jnp.dot(cast(xf_blk.reshape(K * TB, D)), cast(wif_ref[:]),
                preferred_element_type=jnp.float32)
        + bif_ref[0, :]
    )
    xpb = (
        jnp.dot(cast(xb_blk.reshape(K * TB, D)), cast(wib_ref[:]),
                preferred_element_type=jnp.float32)
        + bib_ref[0, :]
    )

    whf = whf_ref[:]
    bhf = bhf_ref[0, :]
    whb = whb_ref[:]
    bhb = bhb_ref[0, :]
    for k in range(K):
        t = tb * K + k
        valid = (L > t)[:, None]
        hf_new = _cell(hf, xpf[k * TB : (k + 1) * TB], whf, bhf, cast)
        hb_new = _cell(hb, xpb[k * TB : (k + 1) * TB], whb, bhb, cast)
        hf = jnp.where(valid, hf_new, hf)
        hb = jnp.where(valid, hb_new, hb)
        zero = jnp.zeros_like(hf)
        yf_ref[k] = jnp.where(valid, hf, zero)
        yb_ref[k] = jnp.where(valid, hb, zero)
    hf_scratch[:] = hf
    hb_scratch[:] = hb


@functools.partial(
    jax.jit,
    static_argnames=("batch_tile", "k_steps", "bf16_mm", "vmem_mb", "interpret"),
)
def gru_layer_dual(
    x: jnp.ndarray,  # (B, T, D)
    x_flip: jnp.ndarray,  # (B, T, D) — flip_padded(x, lengths)
    lengths: jnp.ndarray,
    pf: dict,  # fwd params {wi,bi,wh,bh}
    pb: dict,  # bwd params
    *,
    batch_tile: int = 128,
    k_steps: int = 8,
    bf16_mm: bool = False,
    vmem_mb: int = 64,
    interpret: Optional[bool] = None,
):
    """Returns (y_fwd, y_bwd_reversed-order) each (B, T, H)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, T, D = x.shape
    H3 = pf["wi"].shape[-1]
    H = H3 // 3
    TB = min(batch_tile, B)
    B_pad = -(-B // TB) * TB
    K = min(k_steps, T)
    T_pad = -(-T // K) * K
    if B_pad != B or T_pad != T:
        pad = ((0, B_pad - B), (0, T_pad - T), (0, 0))
        x = jnp.pad(x, pad)
        x_flip = jnp.pad(x_flip, pad)
        lengths = jnp.pad(lengths, (0, B_pad - B))
    len2d = lengths.astype(jnp.int32).reshape(-1, 1)
    xf_tm = x.swapaxes(0, 1)
    xb_tm = x_flip.swapaxes(0, 1)

    cast = (lambda a: a.astype(jnp.bfloat16)) if bf16_mm else (lambda a: a)
    w = lambda a: a.astype(jnp.float32)
    wspec = lambda r, c: pl.BlockSpec((r, c), lambda i, t: (0, 0),
                                      memory_space=pltpu.VMEM)
    yf_tm, yb_tm = pl.pallas_call(
        partial(_gru_dual_kernel, K, cast),
        grid=(B_pad // TB, T_pad // K),
        in_specs=[
            pl.BlockSpec((TB, 1), lambda i, t: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, TB, D), lambda i, t: (t, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, TB, D), lambda i, t: (t, i, 0), memory_space=pltpu.VMEM),
            wspec(D, H3), wspec(1, H3), wspec(D, H3), wspec(1, H3),
            wspec(H, H3), wspec(1, H3), wspec(H, H3), wspec(1, H3),
        ],
        out_specs=(
            pl.BlockSpec((K, TB, H), lambda i, t: (t, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, TB, H), lambda i, t: (t, i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T_pad, B_pad, H), jnp.float32),
            jax.ShapeDtypeStruct((T_pad, B_pad, H), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((TB, H), jnp.float32),
            pltpu.VMEM((TB, H), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb * 1024 * 1024
        ),
        interpret=interpret,
    )(len2d, xf_tm.astype(jnp.float32), xb_tm.astype(jnp.float32),
      w(pf["wi"]), w(pf["bi"]).reshape(1, H3),
      w(pb["wi"]), w(pb["bi"]).reshape(1, H3),
      w(pf["wh"]), w(pf["bh"]).reshape(1, H3),
      w(pb["wh"]), w(pb["bh"]).reshape(1, H3))
    return yf_tm.swapaxes(0, 1)[:B, :T], yb_tm.swapaxes(0, 1)[:B, :T]


def bigru_dual(x, lengths, layers, *, batch_tile=128, k_steps=8,
               bf16_mm=False, vmem_mb=64, interpret=None):
    out = x
    for lp in layers:
        xf = out
        xb = flip_padded(out, lengths)
        y_f, y_b_rev = gru_layer_dual(
            xf, xb, lengths, lp["fwd"], lp["bwd"],
            batch_tile=batch_tile, k_steps=k_steps, bf16_mm=bf16_mm,
            vmem_mb=vmem_mb, interpret=interpret,
        )
        y_b = flip_padded(y_b_rev, lengths)
        out = jnp.concatenate([y_f, y_b], axis=-1)
    return out


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
        ("dual k8 tb128", lambda xc: bigru_dual(
            xc, lengths, layers, batch_tile=128, k_steps=8)),
        ("dual k4 tb256", lambda xc: bigru_dual(
            xc, lengths, layers, batch_tile=256, k_steps=4)),
        ("dual k8 tb256", lambda xc: bigru_dual(
            xc, lengths, layers, batch_tile=256, k_steps=8)),
        ("dual k4 tb512", lambda xc: bigru_dual(
            xc, lengths, layers, batch_tile=512, k_steps=4)),
        ("dual k8 tb512", lambda xc: bigru_dual(
            xc, lengths, layers, batch_tile=512, k_steps=8)),
        ("dual k16 tb512", lambda xc: bigru_dual(
            xc, lengths, layers, batch_tile=512, k_steps=16)),
        ("dual k8 tb512 bf16", lambda xc: bigru_dual(
            xc, lengths, layers, batch_tile=512, k_steps=8, bf16_mm=True)),
        ("dual k32 tb512", lambda xc: bigru_dual(
            xc, lengths, layers, batch_tile=512, k_steps=32)),
    ]
    base = None
    for name, fn in variants:
        try:
            y = fn(x)
            err = float(jnp.max(jnp.abs(jnp.asarray(y) - y_ref)))
            dt = timeit(fn, x)
            if base is None:
                base = dt
            print(f"{name:>22s}: {dt*1e3:8.3f} ms  {base/dt:5.2f}x  err={err:.2e}",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            msg = str(e).split("\n")[0][:160]
            print(f"{name:>22s}: FAILED {type(e).__name__}: {msg}", flush=True)


if __name__ == "__main__":
    main()
