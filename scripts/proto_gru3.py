"""Prototype v3: fused-projection Pallas GRU — input projection in-kernel.

proto_gru2 measured that stacking directions along batch costs more in XLA
concat copies (~0.6 ms) than the fusion saves, so this version keeps one
pallas_call per direction (like ops/pallas_gru.py v1) and attacks HBM traffic
instead: the hoisted xp = x @ Wi + bi (B,T,3H) f32 round-trip (~75 MB/layer
at B=512/T=32/H=192) is replaced by computing the projection on the MXU
*inside* the kernel from the raw (K, TB, D) input block.

grid = (batch_tiles, T/K); K timesteps unrolled per grid entry; carry in VMEM
scratch across the sequential T dimension.

Usage: python scripts/proto_gru3.py [B] [T]
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


def _gru_fusedproj_kernel(K, cast, len_ref, x_ref, wi_ref, bi_ref, wh_ref,
                          bh_ref, y_ref, h_scratch):
    tb = pl.program_id(1)

    @pl.when(tb == 0)
    def _():
        h_scratch[:] = jnp.zeros_like(h_scratch)

    h = h_scratch[:]  # (TB, H) f32
    H = h.shape[-1]
    TB = h.shape[0]
    L = len_ref[:, 0]
    wi = wi_ref[:]  # (D, 3H)
    bi = bi_ref[0, :]  # (3H,)
    wh = wh_ref[:]  # (H, 3H)
    bh = bh_ref[0, :]

    x_blk = x_ref[:]  # (K, TB, D)
    D = x_blk.shape[-1]
    xp_all = (
        jnp.dot(cast(x_blk.reshape(K * TB, D)), cast(wi),
                preferred_element_type=jnp.float32)
        + bi
    )  # (K*TB, 3H)

    for k in range(K):
        t = tb * K + k
        xp_t = xp_all[k * TB : (k + 1) * TB]
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
    jax.jit,
    static_argnames=("batch_tile", "k_steps", "bf16_mm", "vmem_mb", "interpret"),
)
def gru_sequence_fusedproj(
    x: jnp.ndarray,  # (B, T, D) — already flipped for the reverse direction
    lengths: jnp.ndarray,
    wi: jnp.ndarray,  # (D, 3H)
    bi: jnp.ndarray,  # (3H,)
    wh: jnp.ndarray,  # (H, 3H)
    bh: jnp.ndarray,  # (3H,)
    *,
    batch_tile: int = 128,
    k_steps: int = 8,
    bf16_mm: bool = False,
    vmem_mb: int = 0,
    interpret: Optional[bool] = None,
):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, T, D = x.shape
    H3 = wi.shape[-1]
    H = H3 // 3
    TB = min(batch_tile, B)
    B_pad = -(-B // TB) * TB
    K = min(k_steps, T)
    T_pad = -(-T // K) * K
    if B_pad != B or T_pad != T:
        x = jnp.pad(x, ((0, B_pad - B), (0, T_pad - T), (0, 0)))
        lengths = jnp.pad(lengths, (0, B_pad - B))
    len2d = lengths.astype(jnp.int32).reshape(-1, 1)
    x_tm = x.swapaxes(0, 1)  # (T_pad, B_pad, D)

    cast = (lambda a: a.astype(jnp.bfloat16)) if bf16_mm else (lambda a: a)
    y_tm = pl.pallas_call(
        partial(_gru_fusedproj_kernel, K, cast),
        grid=(B_pad // TB, T_pad // K),
        in_specs=[
            pl.BlockSpec((TB, 1), lambda i, t: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, TB, D), lambda i, t: (t, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, H3), lambda i, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H3), lambda i, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H3), lambda i, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H3), lambda i, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (K, TB, H), lambda i, t: (t, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((T_pad, B_pad, H), jnp.float32),
        scratch_shapes=[pltpu.VMEM((TB, H), jnp.float32)],
        compiler_params=(
            pltpu.CompilerParams(vmem_limit_bytes=vmem_mb * 1024 * 1024)
            if vmem_mb else None
        ),
        interpret=interpret,
    )(len2d, x_tm.astype(jnp.float32),
      wi.astype(jnp.float32), bi.astype(jnp.float32).reshape(1, H3),
      wh.astype(jnp.float32), bh.astype(jnp.float32).reshape(1, H3))
    return y_tm.swapaxes(0, 1)[:B, :T]


def gru_layer_fusedproj(x, lengths, params, *, reverse=False, batch_tile=128,
                        k_steps=8, bf16_mm=False, vmem_mb=0, interpret=None):
    if reverse:
        x = flip_padded(x, lengths)
    y = gru_sequence_fusedproj(
        x, lengths, params["wi"], params["bi"], params["wh"], params["bh"],
        batch_tile=batch_tile, k_steps=k_steps, bf16_mm=bf16_mm,
        vmem_mb=vmem_mb, interpret=interpret,
    )
    if reverse:
        y = flip_padded(y, lengths)
    return y


def bigru_fusedproj(x, lengths, layers, *, batch_tile=128, k_steps=8,
                    bf16_mm=False, vmem_mb=0, interpret=None):
    out = x
    for lp in layers:
        y_f = gru_layer_fusedproj(out, lengths, lp["fwd"], reverse=False,
                                  batch_tile=batch_tile, k_steps=k_steps,
                                  bf16_mm=bf16_mm, vmem_mb=vmem_mb,
                                  interpret=interpret)
        y_b = gru_layer_fusedproj(out, lengths, lp["bwd"], reverse=True,
                                  batch_tile=batch_tile, k_steps=k_steps,
                                  bf16_mm=bf16_mm, vmem_mb=vmem_mb,
                                  interpret=interpret)
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
        ("fusedproj k4 tb256", lambda xc: bigru_fusedproj(
            xc, lengths, layers, batch_tile=256, k_steps=4)),
        ("fusedproj k8 tb256 v64", lambda xc: bigru_fusedproj(
            xc, lengths, layers, batch_tile=256, k_steps=8, vmem_mb=64)),
        ("fusedproj k4 tb512 v64", lambda xc: bigru_fusedproj(
            xc, lengths, layers, batch_tile=512, k_steps=4, vmem_mb=64)),
        ("fusedproj k8 tb512 v96", lambda xc: bigru_fusedproj(
            xc, lengths, layers, batch_tile=512, k_steps=8, vmem_mb=96)),
        ("fusedproj k16 tb512 v110", lambda xc: bigru_fusedproj(
            xc, lengths, layers, batch_tile=512, k_steps=16, vmem_mb=110)),
        ("fusedproj k2 tb512 v64", lambda xc: bigru_fusedproj(
            xc, lengths, layers, batch_tile=512, k_steps=2, vmem_mb=64)),
        ("fusedproj k1 tb512 v64", lambda xc: bigru_fusedproj(
            xc, lengths, layers, batch_tile=512, k_steps=1, vmem_mb=64)),
    ]
    base = None
    for name, fn in variants:
        try:
            y = fn(x)
            err = float(jnp.max(jnp.abs(jnp.asarray(y) - y_ref)))
            dt = timeit(fn, x)
            if base is None:
                base = dt
            print(f"{name:>26s}: {dt*1e3:8.3f} ms  {base/dt:5.2f}x  err={err:.2e}",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            msg = str(e).split("\n")[0][:160]
            print(f"{name:>26s}: FAILED {type(e).__name__}: {msg}", flush=True)


if __name__ == "__main__":
    main()
