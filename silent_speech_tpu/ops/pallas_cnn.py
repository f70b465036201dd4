"""Pallas fused TinyROICNN kernel.

The ROI CNN dominates inference cost under XLA's generic conv lowering
(~7.5 ms for an 8192-frame batch vs ~0.9 ms for the whole BiGRU): with 1-24
channels the MXU runs at a few percent utilization. This kernel restructures
all three convolutions as *output-packed im2col matmuls* so the MXU columns
are filled with (w_offset x out_channel) pairs instead of just the tiny
out-channel dim:

    out[(f, h), (w_tile: w_off, co)] = patch[(f, h), (dy, wx, ci)] @ Kpacked

- Kpacked[(dy, wx, ci), (w_off, co)] = k[dy, wx - w_off, ci, co] (zero where
  the tap falls outside the 3x3 window) is precomputed host-side once per
  weight set; padding K rows up to the next multiple of 8 is free because the
  padded rows are zero.
- Patches are assembled in VMEM from three row-shifted views (frame-boundary
  rows masked to zero = SAME padding) of a width-haloed activation buffer;
  each (dy) block is one contiguous lane slice, so construction is pure
  copies — no gathers, no strided lanes.
- Activations live in an interleaved (frames*height, width*channels) layout;
  2x2 max pooling is two reshaped max-reductions; everything for a 16-frame
  tile (normalize -> conv1 -> pool -> conv2 -> pool -> conv3 -> global mean
  -> fc) stays in VMEM.

The whole batch makes exactly one HBM pass over the uint8 input and writes
only the (N, emb) embeddings. Matches the XLA path to ~1e-4 (floating-point
reassociation only); verified in tests/test_pallas_cnn.py, wired as
``roi_impl='pallas'`` on the live forward.

Performance status (v5e-1, 8192-frame batch): correct but NOT yet faster than
XLA's conv lowering (~11.5 ms vs 7.5 ms) — stage ablation
(``_DEBUG_STOP_AFTER``) shows the cost is Mosaic relayout passes (the
(R/2,2,L) pool reshape, unaligned 18/80/160-lane patch slices), not MACs
(which total ~2 ms of MXU time). F_TILE=32 exceeds the 16 MB VMEM scoped
limit. Also tried: building patches with lane ROLLS + aligned full-width
copies into block-padded K rows (zero-weight overhang) — measured the same
(rolls cost what the masked copies cost; the pools' (R/2,2,L) reshape-max
still adds ~3.7 ms). Treat ``roi_impl='xla'`` (or the bitwise-equal
``roi_impl='grouped'``) as the production path; this kernel is kept as the
correct scaffold + packing scheme for a future iteration with a real
profiler.

Reference architecture: train_model_official.py:209-229 (TinyROICNN).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F_TILE = 16  # frames per grid step

# perf-debug knob: truncate the kernel after a stage ("conv1", "pool1",
# "conv2", "pool2", "conv3"); None = full kernel. Set before tracing.
_DEBUG_STOP_AFTER = None
H1, W1, C1 = 48, 96, 8  # conv1 geometry
H2, W2, C2in, C2 = 24, 48, 8, 16
H3, W3, C3in, C3 = 12, 24, 16, 24
EMB_IN = 24


# ----------------------------------------------------------------------------
# host-side weight packing
# ----------------------------------------------------------------------------

def _pack_conv(k: np.ndarray, w_tile: int, wx_len: int, k_rows_pad: int):
    """k: (3, 3, Ci, Co) HWIO -> (k_rows_pad, w_tile*Co) packed matrix.

    Row index = dy * (wx_len * Ci) + wx * Ci + ci; col = w_off * Co + co.
    Nonzero iff dx = wx - w_off in [0, 3).
    """
    k = np.asarray(k, np.float32)
    _, _, Ci, Co = k.shape
    out = np.zeros((k_rows_pad, w_tile * Co), np.float32)
    for dy in range(3):
        for w_off in range(w_tile):
            for dx in range(3):
                wx = w_off + dx
                if wx >= wx_len:
                    continue
                for ci in range(Ci):
                    row = dy * (wx_len * Ci) + wx * Ci + ci
                    out[row, w_off * Co : (w_off + 1) * Co] = k[dy, dx, ci, :]
    # entries are disjoint in (row, col): col fixes w_off, row fixes (dy,wx,ci)
    return out


def _pack_conv_halfpooled(k: np.ndarray, w_tile: int, n_groups: int,
                          k_rows_pad: int):
    """Packed conv matrix whose K dim walks *unpooled* width groups.

    Lane-direction 2x max pooling has no cheap Mosaic lowering, so the
    preceding stage only row-pools and leaves lanes as 2x-redundant groups
    (group g holds max(g, g+1) after a roll+max; even g are the true pooled
    values). This packing reads the even groups and zeroes the odd ones —
    the lane compaction is absorbed into MXU columns that were padding
    anyway. Row index = dy * (n_groups * Ci) + gi * Ci + ci where gi indexes
    the 2x-redundant group window; only even gi carry weights, with pooled
    position p = gi // 2 and dx = p - w_off.
    """
    k = np.asarray(k, np.float32)
    _, _, Ci, Co = k.shape
    out = np.zeros((k_rows_pad, w_tile * Co), np.float32)
    for dy in range(3):
        for gi in range(0, n_groups, 2):
            p = gi // 2
            for w_off in range(w_tile):
                dx = p - w_off
                if not 0 <= dx < 3:
                    continue
                for ci in range(Ci):
                    row = dy * (n_groups * Ci) + gi * Ci + ci
                    out[row, w_off * Co : (w_off + 1) * Co] = k[dy, dx, ci, :]
    return out


def _tile_bias(b: np.ndarray, w_tile: int) -> np.ndarray:
    return np.tile(np.asarray(b, np.float32), w_tile)[None, :]


def pack_roi_cnn_params(params: dict) -> dict:
    """TinyROICNN param pytree (models/bigru.py layout) -> packed kernel
    operands. Cheap; do it once per loaded checkpoint."""
    k1 = _pack_conv(np.asarray(params["conv0"]["w"]), 16, 18, 64)  # (64,128)
    k2 = _pack_conv_halfpooled(np.asarray(params["conv1"]["w"]), 8, 20, 512)
    k3 = _pack_conv_halfpooled(np.asarray(params["conv2"]["w"]), 8, 20, 960)
    return {
        "k1": jnp.asarray(k1),
        "k2": jnp.asarray(k2),  # (512, 128)
        "k3": jnp.asarray(k3),  # (960, 192)
        "b1": jnp.asarray(_tile_bias(np.asarray(params["conv0"]["b"]), 16)),
        "b2": jnp.asarray(_tile_bias(np.asarray(params["conv1"]["b"]), 8)),
        "b3": jnp.asarray(_tile_bias(np.asarray(params["conv2"]["b"]), 8)),
        "fc_w": jnp.asarray(np.asarray(params["fc"]["w"], np.float32)),
        "fc_b": jnp.asarray(np.asarray(params["fc"]["b"], np.float32)[None, :]),
    }


# ----------------------------------------------------------------------------
# kernel
# ----------------------------------------------------------------------------

def _row_shifted(x, dy, h, n_frames):
    """x: (n_frames*h, L). Returns x with rows holding x[(f, hh + dy - 1)],
    zero where out of frame (SAME zero padding along height)."""
    shift = dy - 1
    if shift == 0:
        return x
    rolled = pltpu.roll(x, (-shift) % x.shape[0], axis=0)  # roll wants >= 0
    hh = jax.lax.broadcasted_iota(jnp.int32, (x.shape[0], 1), 0) % h
    ok = (hh + shift >= 0) & (hh + shift < h)
    return jnp.where(ok, rolled, 0.0)


def _iota2(shape, dim):
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim)


def _half_pool(x, C):
    """2x2 max pool, half-materialized for the Mosaic lowering set:

    - rows compact exactly via the one reshape Mosaic supports,
      ``(R/2, 2, L)`` + max over the middle axis;
    - lanes only roll+max, leaving 2x-redundant C-lane groups where every
      *even* group holds the true pooled value — the downstream packed conv
      (``_pack_conv_halfpooled``) reads even groups and zero-weights odd
      ones, so the lane compaction rides along in the next MXU matmul.

    x: (R, L) -> (R/2, L) with redundant lanes.
    """
    R, L = x.shape
    rows = jnp.max(x.reshape(R // 2, 2, L), axis=1)
    return jnp.maximum(rows, pltpu.roll(rows, L - C, axis=1))


def _roi_cnn_kernel(standardize: bool,
                    roi_ref, k1_ref, b1_ref, k2_ref, b2_ref, k3_ref, b3_ref,
                    fcw_ref, fcb_ref, out_ref,
                    x1_ref, c1_ref, x2_ref, c2_ref, x3_ref, c3_ref,
                    p1_ref, p2_ref, p3_ref):
    F = F_TILE
    # the K-pad rows of the packed weights are zero, but the matching patch
    # columns are never written — zero them so 0 * garbage can't produce NaN
    p1_ref[:, 54:] = jnp.zeros_like(p1_ref[:, 54:])
    p2_ref[:, 480:] = jnp.zeros_like(p2_ref[:, 480:])

    # Mosaic has no direct u8 -> f32 cast; widen through int32
    x = roi_ref[...].astype(jnp.int32).astype(jnp.float32) * (1.0 / 255.0)
    xr = x.reshape(F * H1, W1)  # merge leading dims only (Mosaic-safe)
    if standardize:
        # per-frame mean/std without (F, H*W) lane reshapes: row sums then a
        # frame-selector matmul, broadcast back the same way
        n_px = H1 * W1
        sf = (_iota2((F, F * H1), 1) // H1 == _iota2((F, F * H1), 0)).astype(
            jnp.float32
        )  # (F, F*H1) frame-row selector
        rowsum = jnp.sum(xr, axis=1, keepdims=True)  # (F*H1, 1)
        rowsq = jnp.sum(xr * xr, axis=1, keepdims=True)
        fsum = jnp.dot(sf, rowsum, preferred_element_type=jnp.float32)  # (F, 1)
        fsq = jnp.dot(sf, rowsq, preferred_element_type=jnp.float32)
        mu = fsum / n_px
        # clamp: the E[x^2]-E[x]^2 form can go slightly negative in f32 on a
        # constant frame — sqrt would NaN and poison the tile
        var = jnp.maximum(fsq - fsum * fsum / n_px, 0.0) / (n_px - 1)
        inv = 1.0 / jnp.maximum(jnp.sqrt(var), 1e-6)
        mu_b = jnp.dot(sf.T, mu, preferred_element_type=jnp.float32)  # (F*H1, 1)
        inv_b = jnp.dot(sf.T, inv, preferred_element_type=jnp.float32)
        xr = (xr - mu_b) * inv_b

    # stage-1 input buffer: (F*48, 128) with 1-px zero halo columns at 0 and 97
    x1_ref[...] = jnp.zeros_like(x1_ref)
    x1_ref[:, 1 : 1 + W1] = xr
    x1 = x1_ref[...]

    # ---- conv1: 6 column tiles of (16 w x 8 c) ----
    rows1 = [_row_shifted(x1, dy, H1, F) for dy in range(3)]
    for j in range(6):
        for dy in range(3):
            p1_ref[:, dy * 18 : dy * 18 + 18] = rows1[dy][:, 16 * j : 16 * j + 18]
        acc = jnp.dot(p1_ref[...], k1_ref[...],
                      preferred_element_type=jnp.float32)
        c1_ref[:, 128 * j : 128 * (j + 1)] = jnp.maximum(acc + b1_ref[...], 0.0)

    if _DEBUG_STOP_AFTER == "conv1":
        out_ref[...] = jnp.zeros_like(out_ref[...]) + jnp.sum(c1_ref[...])
        return

    # ---- pool1 (half-materialized): (F*48, 768) -> (F*24, 768 redundant) ----
    half1 = _half_pool(c1_ref[...], C1)

    # stage-2 buffer, 2-group (16-lane) zero halos: (F*24, 800)
    x2_ref[...] = jnp.zeros_like(x2_ref)
    x2_ref[:, 16 : 16 + W1 * C1] = half1
    x2 = x2_ref[...]

    if _DEBUG_STOP_AFTER == "pool1":
        out_ref[...] = jnp.zeros_like(out_ref[...]) + jnp.sum(half1)
        return

    # ---- conv2: 6 column tiles of (8 w x 16 c); K walks unpooled groups ----
    rows2 = [_row_shifted(x2, dy, H2, F) for dy in range(3)]
    for j in range(6):
        for dy in range(3):
            p2_ref[:, dy * 160 : dy * 160 + 160] = rows2[dy][:, 128 * j : 128 * j + 160]
        acc = jnp.dot(p2_ref[...], k2_ref[...],
                      preferred_element_type=jnp.float32)
        c2_ref[:, 128 * j : 128 * (j + 1)] = jnp.maximum(acc + b2_ref[...], 0.0)

    if _DEBUG_STOP_AFTER == "conv2":
        out_ref[...] = jnp.zeros_like(out_ref[...]) + jnp.sum(c2_ref[...])
        return

    # ---- pool2 (half-materialized): (F*24, 768) -> (F*12, 768 redundant) ----
    half2 = _half_pool(c2_ref[...], C2)

    # stage-3 buffer, 2-group (32-lane) zero halos: (F*12, 832)
    x3_ref[...] = jnp.zeros_like(x3_ref)
    x3_ref[:, 32 : 32 + W2 * C2] = half2
    x3 = x3_ref[...]

    if _DEBUG_STOP_AFTER == "pool2":
        out_ref[...] = jnp.zeros_like(out_ref[...]) + jnp.sum(half2)
        return

    # ---- conv3: 3 column tiles of (8 w x 24 c); K walks unpooled groups ----
    rows3 = [_row_shifted(x3, dy, H3, F) for dy in range(3)]
    for j in range(3):
        for dy in range(3):
            p3_ref[:, dy * 320 : dy * 320 + 320] = rows3[dy][:, 256 * j : 256 * j + 320]
        acc = jnp.dot(p3_ref[...], k3_ref[...],
                      preferred_element_type=jnp.float32)
        c3_ref[:, 192 * j : 192 * (j + 1)] = jnp.maximum(acc + b3_ref[...], 0.0)

    if _DEBUG_STOP_AFTER == "conv3":
        out_ref[...] = jnp.zeros_like(out_ref[...]) + jnp.sum(c3_ref[...])
        return

    # ---- global mean over (h, w) + fc (selector matmuls, no 4-D reshape) ----
    c3 = c3_ref[...]  # (F*12, 24w*24c)
    sfr = (
        _iota2((F, F * H3), 1) // H3 == _iota2((F, F * H3), 0)
    ).astype(jnp.float32)
    by_frame = jnp.dot(sfr, c3, preferred_element_type=jnp.float32)  # (F, 576)
    L3 = W3 * C3
    scol = (
        _iota2((L3, C3), 0) % C3 == _iota2((L3, C3), 1)
    ).astype(jnp.float32)
    feat = jnp.dot(by_frame, scol, preferred_element_type=jnp.float32) / (
        H3 * W3
    )  # (F, 24)
    out_ref[...] = (
        jnp.dot(feat, fcw_ref[...], preferred_element_type=jnp.float32)
        + fcb_ref[...]
    )


@functools.partial(jax.jit, static_argnames=("standardize", "interpret"))
def roi_cnn_pallas(
    roi_u8: jnp.ndarray,
    packed: dict,
    *,
    standardize: bool = False,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """roi_u8: (N, 48, 96) uint8 -> embeddings (N, emb) float32.

    Fuses /255 normalization (+ optional per-frame train-path
    standardization), the three convs, pools, global mean and the fc.
    """
    if interpret is None:
        from .pallas_gru import default_interpret

        interpret = default_interpret()
    N = roi_u8.shape[0]
    emb = packed["fc_w"].shape[-1]
    N_pad = -(-N // F_TILE) * F_TILE
    if N_pad != N:
        roi_u8 = jnp.pad(roi_u8, ((0, N_pad - N), (0, 0), (0, 0)))

    F = F_TILE
    kernel = functools.partial(_roi_cnn_kernel, standardize)
    out = pl.pallas_call(
        kernel,
        grid=(N_pad // F,),
        in_specs=[
            pl.BlockSpec((F, H1, W1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((64, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((512, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((960, 192), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 192), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((EMB_IN, emb), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, emb), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((F, emb), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N_pad, emb), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((F * H1, 128), jnp.float32),  # x1 (haloed input)
            pltpu.VMEM((F * H1, 768), jnp.float32),  # conv1 out
            pltpu.VMEM((F * H2, 800), jnp.float32),  # x2 (half-pooled, haloed)
            pltpu.VMEM((F * H2, 768), jnp.float32),  # conv2 out
            pltpu.VMEM((F * H3, 832), jnp.float32),  # x3 (half-pooled, haloed)
            pltpu.VMEM((F * H3, 576), jnp.float32),  # conv3 out
            pltpu.VMEM((F * H1, 64), jnp.float32),  # patch1
            pltpu.VMEM((F * H2, 512), jnp.float32),  # patch2
            pltpu.VMEM((F * H3, 960), jnp.float32),  # patch3
        ],
        interpret=interpret,
    )(roi_u8, packed["k1"], packed["b1"], packed["k2"], packed["b2"],
      packed["k3"], packed["b3"], packed["fc_w"], packed["fc_b"])
    return out[:N]
