"""Pallas fused GRU sequence kernel (inference path).

The GRU's sequential recurrence is the one part of the model XLA cannot
parallelize over time; under `lax.scan` every step is a separate fusion with
its own HBM round-trips for the carry. This kernel runs the whole time loop
on-core for one batch tile, with the input projection fused in:

- grid = (batch_tiles, T / k_steps), time innermost: the hidden-state carry
  lives in a VMEM scratch buffer that persists across sequential grid steps
  (the standard TPU carry-across-grid pattern), so the recurrent state never
  touches HBM;
- the input projection xp = x @ Wi + bi is computed *inside* the kernel from
  the raw (k_steps, TB, D) input block as one MXU matmul per grid entry —
  unlike the scan path's hoisted projection, the (B, T, 3H) xp tensor never
  exists in HBM (~75 MB/layer saved at B=512/T=32/H=192);
- k_steps timesteps are unrolled per grid entry so DMA blocks are large and
  grid overhead is amortized;
- the recurrent weights are constant-index blocks, fetched into VMEM once
  per batch tile and reused for all T steps;
- variable lengths use the same carry-freeze-and-zero-output masking as the
  scan path, so results are bit-compatible with `gru_layer_single_direction`
  (verified in tests/test_pallas_gru.py).

Measured (v5e-1, B=512/T=32/H=192, 2-layer biGRU, scripts/proto_gru3.py):
scan 0.94 ms -> this kernel 0.78-0.80 ms (1.17-1.19x) at batch_tile=512,
k_steps in {2,4}. Retired alternatives, each measured slower
(scripts/proto_gru2.py, proto_gru4.py): stacking both directions along batch
(0.63x — XLA's batch-concat copies dominate), dual-chain single kernel with
separate refs (0.85x — the chains don't overlap, VMEM pressure doubles),
k_steps >= 8 (DMA blocks too large, 1.03-1.11x), bf16 matmuls (no MXU-rate
advantage on this chip). The stack's floor is the recurrent+projection
matmul work itself (~0.67 ms at peak MXU), so ~1.2x is the practical ceiling
of any kernel at these shapes.

The kernel computes in f32 internally regardless of the model's
compute_dtype: at bf16 serving this measured *equal speed* to the bf16 scan
(5.10 vs 5.20 ms full forward at B=256, scripts/bench_fwd_variants.py) with
~3x tighter logits fidelity (2.1e-3 vs 6.6e-3 drift) — the GRU's HBM share
is small, so f32 math here is free accuracy.

The kernel is inference-path; training keeps the scan implementation (XLA
derives its gradient). `bigru_pallas` mirrors ops/gru.py's `bigru` layer
stacking, including the within-valid-length flip for the reverse direction
(reference packed-GRU semantics: train_model_official.py:301-305).
"""

from __future__ import annotations

import functools
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .gru import flip_padded

_VMEM_LIMIT_BYTES = 64 * 1024 * 1024


def default_interpret() -> bool:
    """Interpret mode unless the computation will actually run on a TPU.

    `jax.default_backend()` alone is wrong when a TPU backend exists but the
    default *device* is pinned to CPU (tests/conftest.py does exactly that):
    the kernel would then be lowered for the CPU backend, which only supports
    interpret mode.
    """
    dev = jax.config.jax_default_device
    if dev is not None:
        platform = dev if isinstance(dev, str) else dev.platform
        return platform != "tpu"
    return jax.default_backend() != "tpu"


def _gru_fusedproj_kernel(K, len_ref, x_ref, wi_ref, bi_ref, wh_ref, bh_ref,
                          y_ref, h_scratch):
    tb = pl.program_id(1)

    @pl.when(tb == 0)
    def _():
        h_scratch[:] = jnp.zeros_like(h_scratch)

    h = h_scratch[:]  # (TB, H) f32
    TB, H = h.shape
    L = len_ref[:, 0]
    wi = wi_ref[:]  # (D, 3H)
    bi = bi_ref[0, :]  # (3H,)
    wh = wh_ref[:]  # (H, 3H)
    bh = bh_ref[0, :]

    x_blk = x_ref[:].astype(jnp.float32)  # (K, TB, D); bf16 stream casts up
    D = x_blk.shape[-1]
    xp_all = (
        jnp.dot(x_blk.reshape(K * TB, D), wi,
                preferred_element_type=jnp.float32)
        + bi
    )  # (K*TB, 3H)

    for k in range(K):
        t = tb * K + k
        xp_t = xp_all[k * TB : (k + 1) * TB]
        hp = jnp.dot(h, wh, preferred_element_type=jnp.float32) + bh
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
    jax.jit, static_argnames=("batch_tile", "k_steps", "interpret",
                              "stream_bf16")
)
def gru_sequence_pallas(
    x: jnp.ndarray,
    lengths: jnp.ndarray,
    wi: jnp.ndarray,
    bi: jnp.ndarray,
    wh: jnp.ndarray,
    bh: jnp.ndarray,
    *,
    batch_tile: int = 512,
    k_steps: int = 4,
    interpret: Optional[bool] = None,
    stream_bf16: bool = False,
):
    """Run a full GRU direction from the raw inputs (projection fused).

    x: (B, T, D) f32; lengths: (B,) i32; wi: (D, 3H); bi: (3H,);
    wh: (H, 3H); bh: (3H,). Returns outputs (B, T, H) with padded positions
    zeroed, identical to ops.gru.gru_layer_single_direction's outputs.

    ``stream_bf16``: DMA the input block into VMEM as bfloat16 (half the x
    bytes) and cast up in-kernel; all math stays f32. Measured ~nothing at
    official shapes and at H=1024 scaled shapes the kernel is matmul-bound,
    not x-DMA-bound, so this stays opt-in (docs/GRU_PERF.md).
    """
    if interpret is None:
        interpret = default_interpret()
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

    # time-major layout so every block's trailing dims are (row-tile, full
    # feature dim) — Mosaic requires the last two block dims be 8/128-aligned
    # or cover the whole array axis
    x_tm = x.swapaxes(0, 1)  # (T_pad, B_pad, D)

    y_tm = pl.pallas_call(
        partial(_gru_fusedproj_kernel, K),
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
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES
        ),
        interpret=interpret,
    )(len2d,
      x_tm.astype(jnp.bfloat16 if stream_bf16 else jnp.float32),
      wi.astype(jnp.float32), bi.astype(jnp.float32).reshape(1, H3),
      wh.astype(jnp.float32), bh.astype(jnp.float32).reshape(1, H3))
    return y_tm.swapaxes(0, 1)[:B, :T]


def gru_layer_pallas(
    x: jnp.ndarray,
    lengths: jnp.ndarray,
    params: dict,
    *,
    reverse: bool = False,
    batch_tile: int = 512,
    k_steps: int = 4,
    interpret: Optional[bool] = None,
):
    """Drop-in Pallas equivalent of ops.gru.gru_layer_single_direction
    (outputs only)."""
    if reverse:
        x = flip_padded(x, lengths)
    y = gru_sequence_pallas(
        x, lengths, params["wi"], params["bi"], params["wh"], params["bh"],
        batch_tile=batch_tile, k_steps=k_steps, interpret=interpret,
    )
    if reverse:
        y = flip_padded(y, lengths)
    return y


def bigru_pallas(
    x: jnp.ndarray,
    lengths: jnp.ndarray,
    layers: list[dict],
    *,
    bidirectional: bool = True,
    batch_tile: int = 512,
    k_steps: int = 4,
    interpret: Optional[bool] = None,
):
    """Stacked (bi)GRU on the Pallas sequence kernel (inference path)."""
    out = x
    for lp in layers:
        y_f = gru_layer_pallas(out, lengths, lp["fwd"], reverse=False,
                               batch_tile=batch_tile, k_steps=k_steps,
                               interpret=interpret)
        if bidirectional:
            y_b = gru_layer_pallas(out, lengths, lp["bwd"], reverse=True,
                                   batch_tile=batch_tile, k_steps=k_steps,
                                   interpret=interpret)
            out = jnp.concatenate([y_f, y_b], axis=-1)
        else:
            out = y_f
    return out
