"""Pallas fused GRU sequence kernel.

The GRU's sequential recurrence is the one part of the model XLA cannot
parallelize over time; under `lax.scan` every step is a separate fusion with
its own HBM round-trips for the carry. This kernel runs the *entire* time
loop on-core for one batch tile:

- grid = (batch_tiles, T), time innermost: the hidden-state carry lives in a
  VMEM scratch buffer that persists across sequential grid steps (the
  standard TPU carry-across-grid pattern), so the recurrent state never
  touches HBM;
- the recurrent weights (H, 3H) are a constant-index block, fetched into VMEM
  once per batch tile and reused for all T steps;
- the input projections xp = x @ Wi + bi for every timestep are precomputed
  *outside* the kernel as one large MXU matmul (the same hoisting the scan
  path uses, ops/gru.py), and stream through the kernel one timestep-block at
  a time with Pallas' automatic double-buffered DMA;
- variable lengths use the same carry-freeze-and-zero-output masking as the
  scan path, so results are bit-compatible with `gru_layer_single_direction`
  (verified in tests/test_pallas_gru.py).

The kernel is inference-path; training keeps the scan implementation (XLA
derives its gradient). `bigru_pallas` mirrors ops/gru.py's `bigru` layer
stacking, including the within-valid-length flip for the reverse direction.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .gru import flip_padded


def _gru_seq_kernel(len_ref, xp_ref, wh_ref, bh_ref, y_ref, h_scratch):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        h_scratch[:] = jnp.zeros_like(h_scratch)

    h = h_scratch[:]  # (TB, H)
    H = h.shape[-1]
    xp_t = xp_ref[0]  # (TB, 3H)
    hp = (
        jnp.dot(h, wh_ref[:], preferred_element_type=jnp.float32)
        + bh_ref[0, :]
    )
    xr, xz, xn = xp_t[:, :H], xp_t[:, H : 2 * H], xp_t[:, 2 * H :]
    hr, hz, hn = hp[:, :H], hp[:, H : 2 * H], hp[:, 2 * H :]
    r = jax.nn.sigmoid(xr + hr)
    z = jax.nn.sigmoid(xz + hz)
    n = jnp.tanh(xn + r * hn)
    h_new = (1.0 - z) * n + z * h

    valid = (len_ref[:, 0] > t)[:, None]  # (TB, 1)
    h_out = jnp.where(valid, h_new, h)
    h_scratch[:] = h_out
    y_ref[0] = jnp.where(valid, h_out, jnp.zeros_like(h_out))


@functools.partial(jax.jit, static_argnames=("batch_tile", "interpret"))
def gru_sequence_pallas(
    xp: jnp.ndarray,
    lengths: jnp.ndarray,
    wh: jnp.ndarray,
    bh: jnp.ndarray,
    *,
    batch_tile: int = 128,
    interpret: Optional[bool] = None,
):
    """Run a full GRU direction given precomputed input projections.

    xp: (B, T, 3H) f32; lengths: (B,) i32; wh: (H, 3H); bh: (3H,).
    Returns outputs (B, T, H) with padded positions zeroed.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, T, H3 = xp.shape
    H = H3 // 3
    TB = min(batch_tile, B)
    B_pad = -(-B // TB) * TB
    if B_pad != B:
        xp = jnp.pad(xp, ((0, B_pad - B), (0, 0), (0, 0)))
        lengths = jnp.pad(lengths, (0, B_pad - B))
    len2d = lengths.astype(jnp.int32).reshape(-1, 1)

    # time-major layout so every block's trailing dims are (row-tile, full
    # feature dim) — Mosaic requires the last two block dims be 8/128-aligned
    # or cover the whole array axis
    xp_tm = xp.swapaxes(0, 1)  # (T, B_pad, 3H)

    y_tm = pl.pallas_call(
        _gru_seq_kernel,
        grid=(B_pad // TB, T),
        in_specs=[
            pl.BlockSpec((TB, 1), lambda i, t: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TB, H3), lambda i, t: (t, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H3), lambda i, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H3), lambda i, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, TB, H), lambda i, t: (t, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((T, B_pad, H), jnp.float32),
        scratch_shapes=[pltpu.VMEM((TB, H), jnp.float32)],
        interpret=interpret,
    )(len2d, xp_tm.astype(jnp.float32), wh.astype(jnp.float32),
      bh.astype(jnp.float32).reshape(1, -1))
    return y_tm.swapaxes(0, 1)[:B]


def gru_layer_pallas(
    x: jnp.ndarray,
    lengths: jnp.ndarray,
    params: dict,
    *,
    reverse: bool = False,
    batch_tile: int = 128,
    interpret: Optional[bool] = None,
):
    """Drop-in Pallas equivalent of ops.gru.gru_layer_single_direction
    (outputs only)."""
    if reverse:
        x = flip_padded(x, lengths)
    xp = (
        jnp.einsum("btd,dh->bth", x, params["wi"].astype(x.dtype))
        + params["bi"].astype(x.dtype)
    )
    y = gru_sequence_pallas(
        xp, lengths, params["wh"], params["bh"],
        batch_tile=batch_tile, interpret=interpret,
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
    batch_tile: int = 128,
    interpret: Optional[bool] = None,
):
    """Stacked (bi)GRU on the Pallas sequence kernel (inference path)."""
    out = x
    for lp in layers:
        y_f = gru_layer_pallas(out, lengths, lp["fwd"], reverse=False,
                               batch_tile=batch_tile, interpret=interpret)
        if bidirectional:
            y_b = gru_layer_pallas(out, lengths, lp["bwd"], reverse=True,
                                   batch_tile=batch_tile, interpret=interpret)
            out = jnp.concatenate([y_f, y_b], axis=-1)
        else:
            out = y_f
    return out
