"""Parity-packed fully-fused TinyROICNN Pallas kernel ("fused" roi_impl).

Round-3's two proven pieces, finally combined (VERDICT r3 item 2):

1. The *parity-packed* conv1+pool1 front (scripts/proto_parity_e2e.py,
   bitwise-exact, 2.0 ms standalone vs ~4.3 ms for the XLA front): the input
   is pre-split into 4 h-mod-4 row classes so BOTH 2x2-pool directions become
   elementwise maxes — the w direction via two packed weight matrices (WE
   computes conv at even w, WO at odd w, pool = max(ye, yo)), the h direction
   via accumulating a max across row-class pairs. Zero Mosaic pool reshapes,
   zero strided anything.
2. The all-in-VMEM multi-stage scaffold (ops/pallas_cnn.py), whose measured
   pathology was exactly the relayout set the parity trick removes (the
   (R/2,2,L) pool reshape-max ~3.7 ms + unaligned 18/80/160-lane patch
   slices; MACs were never the problem).

This kernel extends parity packing through conv2/pool2/conv3 so control
NEVER returns to XLA mid-CNN — docs/ROI_CNN_PERF.md measured any
Pallas->XLA-conv boundary at +14 ms (a 302 MB row-major->batch-minor layout
copy at ~20 GB/s), which is what killed the round-2 hybrid. Here the only
HBM traffic is one pass over the uint8 input and the (N, emb) output.

Layout invariants (per grid step of F frames, rows always = (frame, row)):

- stage-1 output  c1p (F*12, 768): row k holds pooled rows m=2k in lanes
  [0:384) and m=2k+1 in [384:768); within a half, lane = w*8 + c (w in
  [0,48)). Produced directly by the parity matmuls — the even/odd halves
  are exactly the h-parity classes stage 2 needs, so stage 2's row-shifted
  views are three 384-lane (128-aligned) slices plus two masked rolls.
- stage-2 patches are FULL-WIDTH: the packed weight (1152, 768) =
  [W2E | W2O] carries the entire 48-w input span per dy view, with window
  selection and SAME-pad boundary zeros baked into the weight zeros, and
  both w-parities riding one dot per h-parity patch. K is ~16x inflated
  over the true MACs, but every patch copy is a whole 128-multiple lane
  block — the measured Mosaic tax was relayouts, not MACs.
- stage-2 output c2 (F*12, 384): lane = w2*16 + c (w2 in [0,24)) — pool2
  halves 24 conv rows back to the 12-row layout, so stage 3 needs only
  +/-1 masked row rolls, no parity split.
- stage-3 conv3 is one full-width matmul (1152, 576); global mean + fc are
  selector matmuls (no 4-D reshapes), emitting the (F, emb) output block.

Matches roi_cnn_grouped / the XLA path to f32 reassociation (<=2e-4;
tests/test_pallas_cnn2.py); wired as ``roi_impl='fused'`` on the live
forward. Reference architecture: train_model_official.py:209-229
(TinyROICNN); normalization contract: live_infer_official.py:126 (/255,
no standardization) and train_model_official.py:286-291 (per-frame
standardize, ddof=1).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# frames per grid step (M = 12*F_TILE matmul rows). Swept on-chip
# (scripts/bench_fused_cnn.py ftile, 2026-08-18): tiled standalone 5.40 /
# 5.03 / 4.69 / 4.69 ms per 8192 frames at 8/16/32/64 — taller dots feed
# the MXU better until M=384 saturates. 32 ships: 64 is e2e-equal at batch
# but pads a single T=32 clip 2x at B=1 (the p50-latency shape).
F_TILE = 32

# geometry (input 48x96 -> 24x48x8 -> 12x24x16 -> 12x24x24 -> mean -> fc)
H0, W0 = 48, 96
HQ = H0 // 4          # rows per h-mod-4 class = 12 (the invariant row count)
W1P, C1 = 48, 8       # pooled stage-1 grid
W2P, C2 = 24, 16      # pooled stage-2 grid
C3 = 24
KP1 = 104             # stage-1 packed K (3 dy * 34 local lanes, padded)

# perf-debug knob: truncate after a stage ("conv1", "conv2", "conv3");
# None = full kernel. Set before tracing (same idiom as ops/pallas_cnn.py).
_DEBUG_STOP_AFTER = None


# ----------------------------------------------------------------------------
# host-side weight packing
# ----------------------------------------------------------------------------

_PACK_SHAPES = (
    (KP1, 128),                    # w1e: stage-1 parity, even conv w
    (KP1, 128),                    # w1o: stage-1 parity, odd conv w
    (3 * W1P * C1, 2 * W2P * C2),  # w2:  stage-2 full-width [W2E | W2O]
    (512, 256),                    # w2t: stage-2 tiled [even | odd]
    (3 * W2P * C2, W2P * C3),      # w3:  stage-3 full-width
    (512, 256),                    # w3t: stage-3 tiled (8 w x 32-pad ch)
)
_PACK_SRC = ("conv0", "conv0", "conv1", "conv1", "conv2", "conv2")


@functools.lru_cache(maxsize=None)
def _pack_indices():
    """THE single definition of the packing geometry: per packed matrix, the
    (rows, cols, flat_src) triples mapping HWIO weight entries to packed
    positions. Both pack functions scatter with these (numpy for concrete
    params, jnp for tracers), so the geometry cannot diverge between them.

    - w1e/w1o (stage-1 parity, (104, 128)): column t*8+co is pooled-w
      position t of a 16-wide j-tile; row dy*34 + (2t+dx [+1 for odd]) is
      the patch lane within the 34-lane haloed tile slice. w1e covers conv
      w=2t, w1o w=2t+1.
    - w2 (stage-2 full-width, (1152, 768) = [W2E | W2O]): row = dy*384 +
      w_in*8 + ci over the whole 48-w span; column q*16+co (even half,
      conv w=2q, taps w_in=2q-1+dx) or 384+q*16+co (odd, taps 2q+dx);
      out-of-range taps are not placed = SAME zero padding, no halo needed.
    - w2t (stage-2 tiled, (512, 256) = [even | odd]): the j-th tile computes
      pooled w2=8j..8j+7 from w_in in [16j-2, 16j+18); rows dy*160 + l*8+ci
      with l = w_in-(16j-2); the same matrix serves every j — edge zeros
      live in the 16-lane halo buffers, not the weights.
    - w3 (stage-3 full-width, (1152, 576)): rows dy*384 + w_in*16 + ci,
      cols w*24+co, taps w_in = w-1+dx (no pool after conv3).
    - w3t (stage-3 tiled, (512, 256)): mirror of the stage-2 tiling — the
      j-th tile computes w=8j..8j+7 from w_in in [8j-1, 8j+9) (a 160-lane
      slice of a 16-lane-haloed c2 buffer); rows dy*160 + l*16 + ci with
      l = q_off + dx; cols q_off*32 + co (C3=24 padded to 32 channels per
      w so tile col blocks stay 128-aligned). Same matrix for every j;
      SAME-pad edge zeros live in the halo lanes.
    """
    s1e, s1o = [], []
    for t in range(16):
        for co in range(8):
            for dy in range(3):
                for dx in range(3):
                    src = (dy * 3 + dx) * 8 + co  # (3,3,1,8) flat
                    s1e.append((dy * 34 + 2 * t + dx, t * 8 + co, src))
                    s1o.append((dy * 34 + 2 * t + 1 + dx, t * 8 + co, src))
    s2 = []
    for dy in range(3):
        for q in range(W2P):
            for dx in range(3):
                for ci in range(C1):
                    for co in range(C2):
                        src = ((dy * 3 + dx) * C1 + ci) * C2 + co
                        col = q * C2 + co
                        we_w = 2 * q - 1 + dx
                        wo_w = 2 * q + dx
                        if 0 <= we_w < W1P:
                            s2.append((dy * 384 + we_w * C1 + ci, col, src))
                        if 0 <= wo_w < W1P:
                            s2.append((dy * 384 + wo_w * C1 + ci,
                                       384 + col, src))
    s2t = []
    for dy in range(3):
        for q_off in range(8):
            for dx in range(3):
                for ci in range(C1):
                    for co in range(C2):
                        src = ((dy * 3 + dx) * C1 + ci) * C2 + co
                        col = q_off * C2 + co
                        le = 2 * q_off + 1 + dx
                        lo = 2 * q_off + 2 + dx
                        s2t.append((dy * 160 + le * C1 + ci, col, src))
                        s2t.append((dy * 160 + lo * C1 + ci, 128 + col, src))
    s3 = []
    for dy in range(3):
        for w in range(W2P):
            for dx in range(3):
                wi = w - 1 + dx
                if not 0 <= wi < W2P:
                    continue
                for ci in range(C2):
                    for co in range(C3):
                        src = ((dy * 3 + dx) * C2 + ci) * C3 + co
                        s3.append((dy * 384 + wi * C2 + ci, w * C3 + co, src))
    s3t = []
    for dy in range(3):
        for q_off in range(8):
            for dx in range(3):
                l = q_off + dx  # local w_in lane group within the tile
                for ci in range(C2):
                    for co in range(C3):
                        src = ((dy * 3 + dx) * C2 + ci) * C3 + co
                        s3t.append((dy * 160 + l * C2 + ci,
                                    q_off * 32 + co, src))
    as_np = lambda s: tuple(np.asarray(v, np.int32) for v in zip(*s))
    return tuple(as_np(s) for s in (s1e, s1o, s2, s2t, s3, s3t))


def _quantize_pack(packed: dict) -> dict:
    """f32 tiled3 pack -> the int8 serving pack (variant='tiled3_q8').

    Per-PACKED-COLUMN symmetric weight quantization. Because every stage is
    haloed (SAME-pad zeros live in activation halo lanes, never in dropped
    weight taps), each packed column holds exactly one output channel's full
    3x3xC kernel — so per-column here IS per-output-channel quantization,
    the standard int8 granularity.

    Emitted operands (all (1, cols) rows broadcast over the tile):
      w1q  s8 [W1E | W1O]       d1  = s1/255 (folds the /255 input scale)
      cf1  = 128*colsum(w1q)*d1 (the centered-input correction, f32)
      w2q/w3q s8 tiles          sw2/sw3 per-column scales
      cq2/cq3 = 128*colsum(wq)  (activation zero-point corrections, f32;
                                 the dequant multiplies them by sw*a_frame)
    Math contract (pinned by tests/test_pallas_cnn2.py's independent
    fake-quant reference): dot(q, wq) + 128*colsum(wq) == dot(q+128, wq),
    and (q+128)*a == the quantized activation, so each stage equals an XLA
    conv over fake-quantized activations with dequantized weights."""
    q8 = lambda m: jnp.clip(jnp.round(m * (127.0 / _colmax(m))),
                            -127, 127).astype(jnp.int8)
    _colmax = lambda m: jnp.maximum(
        jnp.max(jnp.abs(m), axis=0, keepdims=True), 1e-30)
    colsum = lambda q: jnp.sum(q.astype(jnp.float32), axis=0, keepdims=True)
    w1 = jnp.concatenate([jnp.asarray(packed["w1e"], jnp.float32),
                          jnp.asarray(packed["w1o"], jnp.float32)], axis=1)
    s1 = _colmax(w1) / 127.0
    w1q = jnp.clip(jnp.round(w1 / s1), -127, 127).astype(jnp.int8)
    d1 = s1 * (1.0 / 255.0)
    w2q = q8(jnp.asarray(packed["w2t"], jnp.float32))
    sw2 = _colmax(jnp.asarray(packed["w2t"], jnp.float32)) / 127.0
    w3q = q8(jnp.asarray(packed["w3t"], jnp.float32))
    sw3 = _colmax(jnp.asarray(packed["w3t"], jnp.float32)) / 127.0
    return {
        "w1q": w1q, "d1": d1, "cf1": 128.0 * colsum(w1q) * d1,
        "b1": packed["b1"],
        "w2q": w2q, "sw2": sw2, "cq2": 128.0 * colsum(w2q),
        "b2": packed["b2"],
        "w3q": w3q, "sw3": sw3, "cq3": 128.0 * colsum(w3q),
        "b3t": packed["b3t"],
        "fc_w": packed["fc_w"], "fc_b": packed["fc_b"],
    }


def pack_roi_cnn_fused_traceable(params: dict,
                                 variant: Optional[str] = None) -> dict:
    """jit-traceable pack (scatter form): identical values to
    ``pack_roi_cnn_fused`` (pinned by tests) but works on tracers, so
    ``forward(roi_impl='fused')`` can pack inline under jit. Negligible
    per-call cost (~10k-element scatters); precompute with the numpy pack
    when params are concrete (Predictor does). ``variant='tiled3_q8'``
    emits the int8 serving pack; any other value emits the full f32 pack
    (every variant reads from it)."""
    mats = []
    for (rows, cols, flat), shape, src in zip(_pack_indices(), _PACK_SHAPES,
                                              _PACK_SRC):
        kf = jnp.asarray(params[src]["w"], jnp.float32).reshape(-1)
        mats.append(jnp.zeros(shape, jnp.float32).at[rows, cols].set(kf[flat]))
    w1e, w1o, w2, w2t, w3, w3t = mats
    tile = lambda b, n: jnp.tile(jnp.asarray(b, jnp.float32), n)[None, :]
    b3 = jnp.asarray(params["conv2"]["b"], jnp.float32)
    b3t_cols = (np.arange(8)[:, None] * 32 + np.arange(C3)[None, :]).ravel()
    b3t = jnp.zeros((1, 256), jnp.float32).at[0, b3t_cols].set(jnp.tile(b3, 8))
    out = {
        "w1e": w1e, "w1o": w1o, "b1": tile(params["conv0"]["b"], W1P),
        "w2": w2, "w2t": w2t, "b2": tile(params["conv1"]["b"], W2P),
        "w3": w3, "b3": tile(params["conv2"]["b"], W2P),
        "w3t": w3t, "b3t": b3t,
        "fc_w": jnp.asarray(params["fc"]["w"], jnp.float32),
        "fc_b": jnp.asarray(params["fc"]["b"], jnp.float32)[None, :],
    }
    if variant == "tiled3_q8":
        return _quantize_pack(out)
    return out


def pack_roi_cnn_fused(params: dict, *, variant: Optional[str] = None) -> dict:
    """TinyROICNN param pytree (models/bigru.py layout) -> packed operands.
    Cheap (host-side numpy scatter over the shared _pack_indices geometry);
    do once per loaded checkpoint.

    ``variant=None`` packs every matrix (the sweep scripts feed one dict to
    all variants). Passing the serving variant skips the full-width w2
    (1152x768) / w3 (1152x576) — or the tile forms — that it never reads,
    so a fixed-variant Predictor doesn't keep ~6 MB of dead f32 weights
    resident in HBM."""
    # keys each variant's kernel call actually loads (roi_cnn_fused)
    if variant not in (None, "wide", "tiled", "tiled3", "stacked", "stacked1",
                       "tiled3_q8"):
        # fail at pack/Predictor-construction time, not at the first
        # forward — roi_cnn_fused raises the same set
        raise ValueError(f"unknown fused-CNN variant {variant!r} (expected "
                         "'wide', 'tiled', 'tiled3', 'stacked', 'stacked1' "
                         "or 'tiled3_q8')")
    need = {
        None: ("w1e", "w1o", "w2", "w2t", "w3", "w3t"),
        "wide": ("w1e", "w1o", "w2", "w3"),
        "tiled": ("w1e", "w1o", "w2t", "w3"),
    }.get(variant, ("w1e", "w1o", "w2t", "w3t"))  # tiled3/stacked*/q8
    mats = {}
    for (rows, cols, flat), shape, src, key in zip(
            _pack_indices(), _PACK_SHAPES, _PACK_SRC,
            ("w1e", "w1o", "w2", "w2t", "w3", "w3t")):
        if key not in need:
            continue
        kf = np.asarray(params[src]["w"], np.float32).reshape(-1)
        W = np.zeros(shape, np.float32)
        W[rows, cols] = kf[flat]  # (row, col) pairs are unique per matrix
        mats[key] = jnp.asarray(W)
    tile = lambda b, n: np.tile(np.asarray(b, np.float32), n)[None, :]
    out = dict(mats)
    out["b1"] = jnp.asarray(tile(params["conv0"]["b"], W1P))     # (1, 384)
    out["b2"] = jnp.asarray(tile(params["conv1"]["b"], W2P))     # (1, 384)
    if "w3" in need:
        out["b3"] = jnp.asarray(tile(params["conv2"]["b"], W2P))  # (1, 576)
    if "w3t" in need:
        b3 = np.asarray(params["conv2"]["b"], np.float32)
        b3t = np.zeros((1, 256), np.float32)
        for q in range(8):
            b3t[0, q * 32: q * 32 + C3] = b3
        out["b3t"] = jnp.asarray(b3t)                            # (1, 256)
    out["fc_w"] = jnp.asarray(np.asarray(params["fc"]["w"], np.float32))
    out["fc_b"] = jnp.asarray(
        np.asarray(params["fc"]["b"], np.float32)[None, :])
    if variant == "tiled3_q8":
        return _quantize_pack(out)
    return out


# ----------------------------------------------------------------------------
# kernel
# ----------------------------------------------------------------------------

def _iota2(shape, dim):
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim)


def _roll_rows(x, shift):
    # Mosaic lowers pltpu.roll to tpu.dynamic_rotate, which only supports
    # 32-bit element types ("Rotate with non-32-bit data" compile error on
    # the bf16 serving mode, measured 2026-08-18). Widen through f32 (exact
    # round-trip for bf16) or i32 (exact for int8) for the rotate; the two
    # VPU casts are noise next to the stage matmuls.
    if x.dtype.itemsize == 4:
        return pltpu.roll(x, shift, axis=0)
    wide = (jnp.float32 if jnp.issubdtype(x.dtype, jnp.floating)
            else jnp.int32)
    return pltpu.roll(x.astype(wide), shift, axis=0).astype(x.dtype)


def _shift_down(x, kk, pad=0.0):
    """Row r receives row r-1's value; ``pad`` at the first row of each
    frame. (Source row one ABOVE = the previous in-frame row.) ``pad`` is
    0.0 for float activations and -128 for the q8 kernel's centered-s8
    encoding of a zero input."""
    return jnp.where(kk == 0, pad, _roll_rows(x, 1))


def _shift_up(x, kk, pad=0.0):
    """Row r receives row r+1's value; ``pad`` at the last row of each
    frame."""
    return jnp.where(kk == HQ - 1, pad, _roll_rows(x, x.shape[0] - 1))


def _front_widen(x_ref, front: str):
    """u8 block load + widen + /255 scale (f32). front='u8' widens via i32
    (Mosaic has no u8->f32 cast); 'bf16'/'f32' arrive pre-widened from XLA.
    Shared by the forward kernel and the training backward's recompute so
    the normalization math cannot diverge."""
    xv = x_ref[...]
    if front == "u8":
        xv = xv.astype(jnp.int32)
    return xv.astype(jnp.float32) * (1.0 / 255.0)


def _front_classes(xw, standardize: bool, F: int):
    """(M, 384) scaled rows -> the four 96-lane h-mod-4 class buffers,
    optionally per-frame standardized (ddof=1, train_model_official.py:
    286-291). The E[x^2]-E[x]^2 variance is clamped before sqrt: a
    constant/saturated frame would otherwise NaN and the selector broadcast
    (0*NaN) would poison the whole tile."""
    M = xw.shape[0]
    xs = [xw[:, W0 * c: W0 * (c + 1)] for c in range(4)]
    if not standardize:
        return xs
    n_px = H0 * W0
    sf = (_iota2((F, M), 1) // HQ == _iota2((F, M), 0)).astype(jnp.float32)
    fsum = jnp.zeros((F, 1), jnp.float32)
    fsq = jnp.zeros((F, 1), jnp.float32)
    for x in xs:
        fsum = fsum + jnp.dot(sf, jnp.sum(x, axis=1, keepdims=True),
                              preferred_element_type=jnp.float32)
        fsq = fsq + jnp.dot(sf, jnp.sum(x * x, axis=1, keepdims=True),
                            preferred_element_type=jnp.float32)
    mu = fsum / n_px
    var = jnp.maximum(fsq - fsum * fsum / n_px, 0.0) / (n_px - 1)
    inv = 1.0 / jnp.maximum(jnp.sqrt(var), 1e-6)
    mu_b = jnp.dot(sf.T, mu, preferred_element_type=jnp.float32)
    inv_b = jnp.dot(sf.T, inv, preferred_element_type=jnp.float32)
    return [(x - mu_b) * inv_b for x in xs]


def _roi_fused_kernel(standardize: bool, variant: str, F: int, front: str,
                      x_ref,
                      w1_ref, b1_ref,
                      w2_ref, b2_ref,
                      w3_ref, b3_ref, fcw_ref, fcb_ref,
                      out_ref, *scratch):
    if variant == "wide":
        halo_ref, p1_ref, c1_ref, p2_ref, c2_ref, p3_ref, c3_ref = scratch
    elif variant == "tiled":
        (halo_ref, p1_ref, c1_ref, he_ref, ho_ref, p2t_ref, c2_ref,
         p3_ref, c3_ref) = scratch
    elif variant == "tiled3":  # tiled stage 2 AND 3 (he/p2t reused)
        (halo_ref, p1_ref, c1_ref, he_ref, ho_ref, p2t_ref, c2_ref,
         c3_ref) = scratch
    elif variant == "stacked":  # tiled3 geometry, ALL tile dots stacked on M
        (halo_ref, p1_ref, y1_ref, c1_ref, he_ref, ho_ref, p2s_ref,
         y2_ref, c2_ref, c3_ref) = scratch
    else:  # stacked1: stacked stage 1 only, tiled3 stages 2+3 (the measured
           # winner split — stacking won stage 1 but lost stages 2/3)
        (halo_ref, p1_ref, y1_ref, c1_ref, he_ref, ho_ref, p2t_ref,
         c2_ref, c3_ref) = scratch
    M = F * HQ
    kk = _iota2((M, 1), 0) % HQ  # in-frame row index

    # /255 matches the live normalization (live_infer_official.py:126)
    # bit-for-bit with the XLA preprocess path. All normalization math is
    # f32; the activations are cast to the compute dtype (= the scratch
    # dtype: f32 exact mode, bf16 serving mode with f32 matmul accumulation)
    # only when stored. The h-mod-4 classes are the four 96-lane slices of
    # the (M, 384) row (a FREE reshape host-side — see roi_cnn_fused);
    # widen once, slice f32.
    #
    # front='u8': raw uint8 in, widened in-kernel via i32 (Mosaic has no
    # u8 -> f32 cast). The unpack sequence measured 1.17 ms per 8192 frames
    # (2026-08-18 ablation) — the single biggest non-dot term.
    # front='bf16'/'f32': XLA pre-widens the integers (EXACT: 0..255 all
    # representable in bf16's 8 mantissa bits) at HBM roofline; the kernel
    # pays 2x/4x input DMA bytes but skips the unpack. Scale stays f32
    # in-kernel, so all fronts are bitwise-identical.
    cdtype = halo_ref.dtype
    xw = _front_widen(x_ref, front)
    if _DEBUG_STOP_AFTER == "load":
        # u8 block load + widen + scale only (no halo fill)
        out_ref[...] = jnp.zeros_like(out_ref[...]) + jnp.sum(xw)
        return
    xs = _front_classes(xw, standardize, F)

    # ---- stage 1: parity conv0 + pool1 (proto_parity_e2e scheme) ----
    for c in range(4):
        halo_ref[c] = jnp.zeros_like(halo_ref[c])
        halo_ref[c, :, 1:1 + W0] = xs[c].astype(cdtype)
    if _DEBUG_STOP_AFTER == "norm":
        # front cost only: u8 load + normalize + halo fill
        out_ref[...] = jnp.zeros_like(out_ref[...]) + jnp.sum(halo_ref[...])
        return
    x3d = _shift_down(halo_ref[3][...], kk)   # class3 rows k-1 (input h=4k-1)
    x0u = _shift_up(halo_ref[0][...], kk)     # class0 rows k+1 (input h=4k+4)
    views = [
        (x3d, halo_ref[0][...], halo_ref[1][...]),
        (halo_ref[0][...], halo_ref[1][...], halo_ref[2][...]),
        (halo_ref[1][...], halo_ref[2][...], halo_ref[3][...]),
        (halo_ref[2][...], halo_ref[3][...], x0u),
    ]
    b1 = b1_ref[...]
    p1_ref[:, 3 * 34:] = jnp.zeros_like(p1_ref[:, 3 * 34:])
    if variant in ("stacked", "stacked1"):
        # all 12 (class, j) patches stacked on M share the one [W1E | W1O]
        # weight -> ONE (12M, KP1) dot instead of 12 (M, KP1) dots (the
        # measured stage-1 rate, 39 T MAC/s, trails stage 3's 68 — short-M
        # dot issue overhead). max commutes with the monotone bf16 rounding,
        # so the post-dot cast keeps c1 bitwise-equal to the tiled3 order.
        blk = lambda k: slice(k * M, (k + 1) * M)
        for c in range(4):
            for j in range(3):
                r = blk(3 * c + j)
                for dy in range(3):
                    p1_ref[r, dy * 34: dy * 34 + 34] = (
                        views[c][dy][:, 32 * j: 32 * j + 34])
        y1_ref[...] = jnp.dot(p1_ref[...], w1_ref[...],
                              preferred_element_type=jnp.float32)
        for base, (ca, cb) in ((0, (0, 1)), (384, (2, 3))):
            for j in range(3):
                ya = y1_ref[blk(3 * ca + j)]
                yb = y1_ref[blk(3 * cb + j)]
                m = jnp.maximum(
                    jnp.maximum(ya[:, 0:128], ya[:, 128:256]),
                    jnp.maximum(yb[:, 0:128], yb[:, 128:256]))
                sl = slice(base + 128 * j, base + 128 * (j + 1))
                c1_ref[:, sl] = m.astype(cdtype)
            osl = slice(base, base + 384)
            c1_ref[:, osl] = jnp.maximum(
                c1_ref[:, osl] + b1.astype(cdtype), 0.0)
    else:
        for base, (ca, cb) in ((0, (0, 1)), (384, (2, 3))):
            for c in (ca, cb):
                for j in range(3):
                    for dy in range(3):
                        p1_ref[:, dy * 34: dy * 34 + 34] = (
                            views[c][dy][:, 32 * j: 32 * j + 34])
                    p = p1_ref[...]
                    # one dot against [W1E | W1O] (128-lane halves): same
                    # per-column accumulation as two separate dots
                    # (bitwise), half the dot-issue count and a fuller MXU
                    # N dimension
                    y = jnp.dot(p, w1_ref[...],
                                preferred_element_type=jnp.float32)
                    m = jnp.maximum(y[:, 0:128],
                                    y[:, 128:256]).astype(cdtype)
                    sl = slice(base + 128 * j, base + 128 * (j + 1))
                    if c == ca:
                        c1_ref[:, sl] = m
                    else:
                        c1_ref[:, sl] = jnp.maximum(c1_ref[:, sl], m)
            osl = slice(base, base + 384)
            c1_ref[:, osl] = jnp.maximum(
                c1_ref[:, osl] + b1.astype(cdtype), 0.0)

    if _DEBUG_STOP_AFTER == "conv1":
        out_ref[...] = jnp.zeros_like(out_ref[...]) + jnp.sum(c1_ref[...])
        return

    # ---- stage 2: parity conv1 + pool2 ----
    # c1p halves ARE the h-parity classes
    ve = c1_ref[:, 0:384]
    vo = c1_ref[:, 384:768]
    if variant == "wide":
        # full-width: four 384-lane copies are the only data movement
        p2_ref[:, 0:384] = _shift_down(vo, kk)    # input row 2p-1
        p2_ref[:, 384:768] = ve                   # input row 2p
        p2_ref[:, 768:1152] = vo                  # input row 2p+1
        p2_ref[:, 1152:1536] = _shift_up(ve, kk)  # input row 2p+2
        pE = p2_ref[:, 0:1152]
        pO = p2_ref[:, 384:1536]
        # one dot per h-parity patch; [W2E|W2O] columns give both w-parities
        yE = jnp.dot(pE, w2_ref[...], preferred_element_type=jnp.float32)
        yO = jnp.dot(pO, w2_ref[...], preferred_element_type=jnp.float32)
        c2_ref[...] = jnp.maximum(
            jnp.maximum(jnp.maximum(yE[:, 0:384], yE[:, 384:768]),
                        jnp.maximum(yO[:, 0:384], yO[:, 384:768]))
            + b2_ref[...], 0.0).astype(cdtype)
    else:
        # tiled: 2.25x fewer MACs; three 160-lane slices per dy view from
        # 16-lane-haloed buffers (the slice starts stay 128-aligned)
        he_ref[...] = jnp.zeros_like(he_ref[...])
        ho_ref[...] = jnp.zeros_like(ho_ref[...])
        he_ref[:, 16:400] = ve
        ho_ref[:, 16:400] = vo
        hE = he_ref[...]
        hO = ho_ref[...]
        vOd = _shift_down(hO, kk)   # input row 2p-1
        vEu = _shift_up(hE, kk)     # input row 2p+2
        b2t = b2_ref[:, 0:128]      # q_off*16+co tile == first 8 q's bias
        if variant == "stacked":
            # 6 (parity, j) patches stacked -> ONE (6M, 512) dot
            blk = lambda k: slice(k * M, (k + 1) * M)
            p2s_ref[:, 480:] = jnp.zeros_like(p2s_ref[:, 480:])
            for pi, viewset in ((0, (vOd, hE, hO)),    # E rows 2p
                                (1, (hE, hO, vEu))):   # O rows 2p+1
                for j in range(3):
                    r = blk(3 * pi + j)
                    sl = slice(128 * j, 128 * j + 160)
                    for dy, view in enumerate(viewset):
                        p2s_ref[r, dy * 160: dy * 160 + 160] = view[:, sl]
            y2_ref[...] = jnp.dot(p2s_ref[...], w2_ref[...],
                                  preferred_element_type=jnp.float32)
            for j in range(3):
                yE = y2_ref[blk(j)]
                yO = y2_ref[blk(3 + j)]
                c2_ref[:, 128 * j: 128 * (j + 1)] = jnp.maximum(
                    jnp.maximum(jnp.maximum(yE[:, 0:128], yE[:, 128:256]),
                                jnp.maximum(yO[:, 0:128], yO[:, 128:256]))
                    + b2t, 0.0).astype(cdtype)
        else:
            p2t_ref[:, 480:] = jnp.zeros_like(p2t_ref[:, 480:])
            for j in range(3):
                sl = slice(128 * j, 128 * j + 160)
                for dy, view in ((0, vOd), (1, hE), (2, hO)):    # E rows 2p
                    p2t_ref[:, dy * 160: dy * 160 + 160] = view[:, sl]
                yE = jnp.dot(p2t_ref[...], w2_ref[...],
                             preferred_element_type=jnp.float32)
                for dy, view in ((0, hE), (1, hO), (2, vEu)):  # O rows 2p+1
                    p2t_ref[:, dy * 160: dy * 160 + 160] = view[:, sl]
                yO = jnp.dot(p2t_ref[...], w2_ref[...],
                             preferred_element_type=jnp.float32)
                c2_ref[:, 128 * j: 128 * (j + 1)] = jnp.maximum(
                    jnp.maximum(jnp.maximum(yE[:, 0:128], yE[:, 128:256]),
                                jnp.maximum(yO[:, 0:128], yO[:, 128:256]))
                    + b2t, 0.0).astype(cdtype)

    if _DEBUG_STOP_AFTER == "conv2":
        out_ref[...] = jnp.zeros_like(out_ref[...]) + jnp.sum(c2_ref[...])
        return

    # ---- stage 3: conv2 (full-width or tiled) + global mean + fc ----
    c2v = c2_ref[...]
    if variant == "stacked":
        # tiled3 scheme, 3 j-patches stacked -> ONE (3M, 512) dot; reuses
        # p2s/y2 rows [0:3M] (p2s lanes 480+ already zeroed by stage 2)
        blk = lambda k: slice(k * M, (k + 1) * M)
        he_ref[...] = jnp.zeros_like(he_ref[...])
        he_ref[:, 16:400] = c2v
        h3 = he_ref[...]
        v3d = _shift_down(h3, kk)
        v3u = _shift_up(h3, kk)
        b3 = b3_ref[...]
        for j in range(3):
            sl = slice(128 * j, 128 * j + 160)
            r = blk(j)
            p2s_ref[r, 0:160] = v3d[:, sl]
            p2s_ref[r, 160:320] = h3[:, sl]
            p2s_ref[r, 320:480] = v3u[:, sl]
        y2_ref[0:3 * M] = jnp.dot(p2s_ref[0:3 * M], w3_ref[...],
                                  preferred_element_type=jnp.float32)
        for j in range(3):
            c3_ref[:, 256 * j: 256 * (j + 1)] = jnp.maximum(
                y2_ref[blk(j)] + b3, 0.0)
    elif variant in ("tiled3", "stacked1"):
        # mirror of the stage-2 tiling (0.59x the full-width packed MACs):
        # c2 haloed by 16 lanes (= one w position) so the per-tile slice
        # [128j, 128j+160) is exactly the 10 input w that tile j's 8 outputs
        # need; output lane = w*32 + co (C3=24 padded to 32 channels per w
        # keeps the tile col blocks 128-aligned; pad cols have zero weight
        # AND zero bias, so ReLU leaves them 0 for the mean selector).
        he_ref[...] = jnp.zeros_like(he_ref[...])
        he_ref[:, 16:400] = c2v
        h3 = he_ref[...]
        v3d = _shift_down(h3, kk)
        v3u = _shift_up(h3, kk)
        b3 = b3_ref[...]
        for j in range(3):
            sl = slice(128 * j, 128 * j + 160)
            p2t_ref[:, 0:160] = v3d[:, sl]
            p2t_ref[:, 160:320] = h3[:, sl]
            p2t_ref[:, 320:480] = v3u[:, sl]
            y = jnp.dot(p2t_ref[...], w3_ref[...],
                        preferred_element_type=jnp.float32)
            c3_ref[:, 256 * j: 256 * (j + 1)] = jnp.maximum(y + b3, 0.0)
    else:
        p3_ref[:, 0:384] = _shift_down(c2v, kk)
        p3_ref[:, 384:768] = c2v
        p3_ref[:, 768:1152] = _shift_up(c2v, kk)
        c3_ref[...] = jnp.maximum(
            jnp.dot(p3_ref[...], w3_ref[...],
                    preferred_element_type=jnp.float32)
            + b3_ref[...], 0.0)

    if _DEBUG_STOP_AFTER == "conv3":
        out_ref[...] = jnp.zeros_like(out_ref[...]) + jnp.sum(c3_ref[...])
        return

    # global mean over (h=12 rows, w=24) via selector matmuls
    sfr = (_iota2((F, M), 1) // HQ == _iota2((F, M), 0)).astype(jnp.float32)
    by_frame = jnp.dot(sfr, c3_ref[...],
                       preferred_element_type=jnp.float32)  # (F, 576|768)
    ch_step = 32 if variant in ("tiled3", "stacked", "stacked1") else C3
    L3 = W2P * ch_step
    scol = (_iota2((L3, C3), 0) % ch_step
            == _iota2((L3, C3), 1)).astype(jnp.float32)
    feat = jnp.dot(by_frame, scol,
                   preferred_element_type=jnp.float32) / (HQ * W2P)
    out_ref[...] = (
        jnp.dot(feat, fcw_ref[...], preferred_element_type=jnp.float32)
        + fcb_ref[...]
    )


def _inframe_spread_max(m, kk):
    """All-rows-in-frame max of a non-negative (M, 1) column: after rounds
    of symmetric masked-roll maxing at shifts 1/2/4/8 every row holds the
    max over its whole HQ=12-row frame (radius 15 >= 11). Pure (M, 1) VPU
    work — no transposes, no (F, .) reshapes, deterministic per frame, so
    quantization scales derived from it are batch- and f_tile-invariant."""
    M = m.shape[0]
    s = 1
    while s < HQ:
        dn = jnp.where(kk - s >= 0, _roll_rows(m, s), 0.0)
        up = jnp.where(kk + s <= HQ - 1, _roll_rows(m, M - s), 0.0)
        m = jnp.maximum(m, jnp.maximum(dn, up))
        s *= 2
    return m


def _roi_fused_q8_kernel(F: int,
                         x_ref,
                         w1_ref, d1_ref, cf1_ref, b1_ref,
                         w2_ref, sw2_ref, cq2_ref, b2_ref,
                         w3_ref, sw3_ref, cq3_ref, b3_ref,
                         fcw_ref, fcb_ref,
                         out_ref,
                         halo_ref, p1_ref, c1_ref, he_ref, ho_ref,
                         p2_ref, c2_ref, c3_ref):
    """int8 serving kernel (variant='tiled3_q8'): the tiled3 dataflow with
    every stage dot on the MXU's s8 x s8 -> s32 path (measured 1.60-1.65x
    the f32 rate at these exact tile shapes, scripts/probe_int8.py) and all
    inter-stage scratch in s8 (4x fewer copy bytes).

    Quantization scheme (see _quantize_pack for the weight side):
    - stage 1 is integer-EXACT w.r.t. the quantized weights: the u8 input
      is centered to s8 (x - 128; SAME-pad halo positions hold -128 = true
      zero), and the precomputed cf1 = 128*colsum(w1q)*d1 correction
      restores dot(x, w1q) from dot(x-128, w1q). |dot| <= 104*128*127 ~
      1.7e6, no s32 overflow.
    - stages 2/3 re-quantize their (ReLU >= 0) f32 inputs per FRAME with a
      dynamic scale a = frame_max/255 via q = floor(v/a + 0.5) - 128 (full
      s8 range; -128 encodes exactly 0, so halo/shift pads are -128). Every
      contraction for an output row draws only from its own frame (row
      shifts are frame-masked), so one scale per row factors out of the dot
      and the dequant is (dot + 128*colsum(wq)) * sw[col] * a[row].
    - dequant happens immediately after each dot; pooling maxes, bias adds,
      ReLU, the global mean and the fc all stay f32, identical to tiled3.

    Per-frame (not per-tile) scales keep each clip's embedding independent
    of what else shares its grid step: outputs are batch-size- and
    f_tile-invariant, like every other variant. Fidelity contract is the
    bf16-style guardrail (argmax-exact on a trained model + bounded logit
    drift, tests/test_pallas_cnn2.py / test_bf16_parity.py), NOT the 1e-3
    parity bar — this is an opt-in fast serving mode.
    """
    M = F * HQ
    kk = _iota2((M, 1), 0) % HQ
    PAD = -128  # s8 encoding of a zero input/activation

    # front: raw u8 -> centered s8 (exact); h-mod-4 classes are the four
    # 96-lane slices of the free-reshaped (M, 384) block, as in tiled3.
    # Only the pad lanes (0 and 97:128) are filled with PAD — a full-buffer
    # fill re-writes 4x the bytes for nothing.
    xi = x_ref[...].astype(jnp.int32) - 128
    for c in range(4):
        halo_ref[c, :, 0:1] = jnp.full_like(halo_ref[c, :, 0:1], PAD)
        halo_ref[c, :, 1 + W0:] = jnp.full_like(halo_ref[c, :, 1 + W0:], PAD)
        halo_ref[c, :, 1:1 + W0] = xi[:, W0 * c: W0 * (c + 1)].astype(jnp.int8)

    # ---- stage 1: parity conv0 + pool1, integer dots ----
    x3d = _shift_down(halo_ref[3][...], kk, PAD)
    x0u = _shift_up(halo_ref[0][...], kk, PAD)
    views = [
        (x3d, halo_ref[0][...], halo_ref[1][...]),
        (halo_ref[0][...], halo_ref[1][...], halo_ref[2][...]),
        (halo_ref[1][...], halo_ref[2][...], halo_ref[3][...]),
        (halo_ref[2][...], halo_ref[3][...], x0u),
    ]
    b1 = b1_ref[...]
    d1 = d1_ref[...]
    cf1 = cf1_ref[...]
    # patch pad lanes (102:104) can hold anything: their w1q rows are zero
    # in the dot AND in the colsum correction
    p1_ref[:, 3 * 34:] = jnp.zeros_like(p1_ref[:, 3 * 34:])
    for base, (ca, cb) in ((0, (0, 1)), (384, (2, 3))):
        for c in (ca, cb):
            for j in range(3):
                for dy in range(3):
                    p1_ref[:, dy * 34: dy * 34 + 34] = (
                        views[c][dy][:, 32 * j: 32 * j + 34])
                y = jnp.dot(p1_ref[...], w1_ref[...],
                            preferred_element_type=jnp.int32)
                yf = y.astype(jnp.float32) * d1 + cf1
                m = jnp.maximum(yf[:, 0:128], yf[:, 128:256])
                sl = slice(base + 128 * j, base + 128 * (j + 1))
                if c == ca:
                    c1_ref[:, sl] = m
                else:
                    c1_ref[:, sl] = jnp.maximum(c1_ref[:, sl], m)
        osl = slice(base, base + 384)
        c1_ref[:, osl] = jnp.maximum(c1_ref[:, osl] + b1, 0.0)

    def quant_rows(v, rv):
        # v >= 0, v <= 1/rv * 255 by construction -> q in [-128, 127].
        # v*rv + 0.5 > 0, so the truncating f32->i32 cast IS floor — no
        # explicit jnp.floor needed; the -128 centering rides the i32 sub.
        return ((v * rv + 0.5).astype(jnp.int32) - 128).astype(jnp.int8)

    def _pad_halo(ref):
        # fill only the 16-lane halo strips, not the whole buffer
        ref[:, 0:16] = jnp.full_like(ref[:, 0:16], PAD)
        ref[:, 400:] = jnp.full_like(ref[:, 400:], PAD)

    # ---- stage 2: re-quantize c1 per frame, tiled int8 dots ----
    c1v = c1_ref[...]
    fm2 = _inframe_spread_max(jnp.max(c1v, axis=1, keepdims=True), kk)
    av2 = jnp.maximum(fm2, 1e-12) * (1.0 / 255.0)   # (M, 1) frame scale
    rv2 = 1.0 / av2
    _pad_halo(he_ref)
    _pad_halo(ho_ref)
    he_ref[:, 16:400] = quant_rows(c1v[:, 0:384], rv2)
    ho_ref[:, 16:400] = quant_rows(c1v[:, 384:768], rv2)
    hE = he_ref[...]
    hO = ho_ref[...]
    vOd = _shift_down(hO, kk, PAD)   # input row 2p-1
    vEu = _shift_up(hE, kk, PAD)     # input row 2p+2
    b2t = b2_ref[:, 0:128]
    sw2 = sw2_ref[...]
    cq2 = cq2_ref[...]
    p2_ref[:, 480:] = jnp.zeros_like(p2_ref[:, 480:])
    for j in range(3):
        sl = slice(128 * j, 128 * j + 160)
        for dy, view in ((0, vOd), (1, hE), (2, hO)):    # E rows 2p
            p2_ref[:, dy * 160: dy * 160 + 160] = view[:, sl]
        yE = jnp.dot(p2_ref[...], w2_ref[...],
                     preferred_element_type=jnp.int32)
        yEf = (yE.astype(jnp.float32) + cq2) * sw2 * av2
        for dy, view in ((0, hE), (1, hO), (2, vEu)):    # O rows 2p+1
            p2_ref[:, dy * 160: dy * 160 + 160] = view[:, sl]
        yO = jnp.dot(p2_ref[...], w2_ref[...],
                     preferred_element_type=jnp.int32)
        yOf = (yO.astype(jnp.float32) + cq2) * sw2 * av2
        c2_ref[:, 128 * j: 128 * (j + 1)] = jnp.maximum(
            jnp.maximum(jnp.maximum(yEf[:, 0:128], yEf[:, 128:256]),
                        jnp.maximum(yOf[:, 0:128], yOf[:, 128:256]))
            + b2t, 0.0)

    # ---- stage 3: re-quantize c2 per frame, tiled int8 dots ----
    c2v = c2_ref[...]
    fm3 = _inframe_spread_max(jnp.max(c2v, axis=1, keepdims=True), kk)
    av3 = jnp.maximum(fm3, 1e-12) * (1.0 / 255.0)
    rv3 = 1.0 / av3
    # he's halo strips already hold PAD from stage 2; only the interior
    # changes hands
    he_ref[:, 16:400] = quant_rows(c2v, rv3)
    h3 = he_ref[...]
    v3d = _shift_down(h3, kk, PAD)
    v3u = _shift_up(h3, kk, PAD)
    b3 = b3_ref[...]
    sw3 = sw3_ref[...]
    cq3 = cq3_ref[...]
    for j in range(3):
        sl = slice(128 * j, 128 * j + 160)
        p2_ref[:, 0:160] = v3d[:, sl]
        p2_ref[:, 160:320] = h3[:, sl]
        p2_ref[:, 320:480] = v3u[:, sl]
        y = jnp.dot(p2_ref[...], w3_ref[...],
                    preferred_element_type=jnp.int32)
        yf = (y.astype(jnp.float32) + cq3) * sw3 * av3
        c3_ref[:, 256 * j: 256 * (j + 1)] = jnp.maximum(yf + b3, 0.0)

    # global mean + fc: identical to tiled3 (ch_step=32 padded layout)
    sfr = (_iota2((F, M), 1) // HQ == _iota2((F, M), 0)).astype(jnp.float32)
    by_frame = jnp.dot(sfr, c3_ref[...],
                       preferred_element_type=jnp.float32)
    L3 = W2P * 32
    scol = (_iota2((L3, C3), 0) % 32
            == _iota2((L3, C3), 1)).astype(jnp.float32)
    feat = jnp.dot(by_frame, scol,
                   preferred_element_type=jnp.float32) / (HQ * W2P)
    out_ref[...] = (
        jnp.dot(feat, fcw_ref[...], preferred_element_type=jnp.float32)
        + fcb_ref[...]
    )


@functools.partial(jax.jit,
                   static_argnames=("standardize", "interpret",
                                    "compute_dtype", "variant", "f_tile",
                                    "front"))
def roi_cnn_fused(
    roi_u8: jnp.ndarray,
    packed: dict,
    *,
    standardize: bool = False,
    interpret: Optional[bool] = None,
    compute_dtype=jnp.float32,
    variant: str = "wide",
    f_tile: int = F_TILE,
    front: str = "u8",
) -> jnp.ndarray:
    """roi_u8: (N, 48, 96) uint8 -> embeddings (N, emb) float32.

    One Pallas program fusing /255 normalization (+ optional train-path
    standardization), all three convs, both pools, the global mean and the
    fc; the only HBM traffic is the uint8 input and the (N, emb) output.

    ``compute_dtype=bfloat16`` stores activations/weights in bf16 (halving
    the in-VMEM copy bytes, the expected overhead term) with every matmul
    still accumulating f32; normalization math, conv3 output, mean and fc
    stay f32. Fidelity bar for bf16 is the argmax gate
    (tests/test_bf16_parity.py), same as the XLA bf16 serving mode.

    ``variant``: 'wide' (full-width stage-2 matmuls, zero sub-128-lane
    slices), 'tiled' (2.25x fewer stage-2 MACs via (512, 256) tile
    matmuls, three 160-lane patch slices per dy view), 'tiled3' (stage 3
    tiled the same way — the measured default), or the retired-but-exact
    'stacked'/'stacked1' (per-stage tile dots stacked on M into one tall
    dot; bitwise-equal, measured slower — docs/ROI_CNN_PERF.md round-4
    follow-up 3). Which wins is an MXU-rate-vs-copy-cost tradeoff measured
    by scripts/bench_fused_cnn.py.

    ``f_tile``: frames per grid step (M = 12*f_tile matmul rows). Bigger
    tiles feed the MXU taller dots (the packed shapes run well below peak
    at M=192 — docs/ROI_CNN_PERF.md round-4 MXU probe) at the cost of VMEM;
    the scoped-vmem limit is raised to 64 MB (same knob as pallas_gru) so
    f_tile=32/64 fit. The conv stages are per-row and exactly invariant to
    f_tile; the mean/standardize selector dots contract over K=M, so f_tile
    regroups their f32 reduction tree (<=1e-6 reassociation drift,
    tests/test_pallas_cnn2.py).
    """
    if variant not in ("wide", "tiled", "tiled3", "stacked", "stacked1",
                       "tiled3_q8"):
        raise ValueError(f"unknown variant {variant!r}")
    if front not in ("u8", "bf16", "f32"):
        raise ValueError(f"unknown front {front!r}")
    if variant == "tiled3_q8":
        if standardize:
            raise ValueError(
                "variant='tiled3_q8' is a serving-only quantized mode; the "
                "train-path standardize forward has no int8 contract — use "
                "'tiled3' (or roi_impl='grouped'/'xla') for training")
        if front != "u8":
            raise ValueError(
                "variant='tiled3_q8' quantizes from the raw u8 stream "
                "in-kernel; front must stay 'u8'")
    if f_tile < 1 or f_tile % 2:
        raise ValueError(f"f_tile must be a positive even frame count, "
                         f"got {f_tile}")
    if tuple(roi_u8.shape[1:]) != (H0, W0):
        # the packing geometry is specific to the reference TinyROICNN
        # input — fail loudly instead of an opaque Mosaic block-shape error
        raise ValueError(
            f"roi_impl='fused' supports only the reference {H0}x{W0} ROI "
            f"(got {tuple(roi_u8.shape[1:])}); use roi_impl='grouped' or "
            "'xla' for other geometries")
    if interpret is None:
        from .pallas_gru import default_interpret

        interpret = default_interpret()
    cdtype = jnp.dtype(compute_dtype)
    N = roi_u8.shape[0]
    emb = packed["fc_w"].shape[-1]
    N_pad = -(-N // f_tile) * f_tile
    if N_pad != N:
        roi_u8 = jnp.pad(roi_u8, ((0, N_pad - N), (0, 0), (0, 0)))

    # h-mod-4 row-class split: (N, 48, 96) -> (N*12, 384) is a FREE
    # row-major reshape (flat index n*4608 + (4k+c)*96 + w is unchanged),
    # leaving class c in lanes [96c, 96c+96) of each 384-lane row. The old
    # roi_u8[:, c::4, :] strided-slice split was a real XLA gather — one of
    # the ~20-50 GB/s pathological relayouts (docs/ROI_CNN_PERF.md), and
    # the dominant term in the measured 1.63 ms kernel front (2026-08-18).
    x_in = roi_u8.reshape(N_pad * HQ, 4 * W0)
    if front != "u8":
        # pre-widen the raw integers in XLA (exact: 0..255 fit bf16's 8
        # mantissa bits) — one fused roofline pass; /255 stays f32 in-kernel
        x_in = x_in.astype(jnp.bfloat16 if front == "bf16" else jnp.float32)

    F = f_tile
    M = F * HQ
    kernel = functools.partial(_roi_fused_kernel, standardize, variant, F,
                               front)
    spec_in = pl.BlockSpec((M, 4 * W0), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                       memory_space=pltpu.VMEM)
    if variant == "tiled3_q8":
        out = pl.pallas_call(
            functools.partial(_roi_fused_q8_kernel, F),
            grid=(N_pad // F,),
            in_specs=[spec_in,
                      const((KP1, 256)), const((1, 256)), const((1, 256)),
                      const((1, 384)),
                      const((512, 256)), const((1, 256)), const((1, 256)),
                      const((1, 384)),
                      const((512, 256)), const((1, 256)), const((1, 256)),
                      const((1, 256)),
                      const((C3, emb)), const((1, emb))],
            out_specs=pl.BlockSpec((F, emb), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N_pad, emb), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((4, M, 128), jnp.int8),   # haloed input classes
                pltpu.VMEM((M, KP1), jnp.int8),      # stage-1 patch
                pltpu.VMEM((M, 768), jnp.float32),   # c1p (dequantized)
                pltpu.VMEM((M, 512), jnp.int8),      # hE (16-lane halos)
                pltpu.VMEM((M, 512), jnp.int8),      # hO / stage-3 halo
                pltpu.VMEM((M, 512), jnp.int8),      # tile patch (s2 + s3)
                pltpu.VMEM((M, 384), jnp.float32),   # c2 (dequantized)
                pltpu.VMEM((M, 768), jnp.float32),   # c3 (w*32+co layout)
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
            interpret=interpret,
        )(x_in, packed["w1q"], packed["d1"], packed["cf1"], packed["b1"],
          packed["w2q"], packed["sw2"], packed["cq2"], packed["b2"],
          packed["w3q"], packed["sw3"], packed["cq3"], packed["b3t"],
          packed["fc_w"], packed["fc_b"])
        return out[:N]
    cast = lambda k: packed[k].astype(cdtype)
    # stage-1 parity halves ride one dot: [W1E | W1O] (128-lane halves)
    w1 = jnp.concatenate([packed["w1e"], packed["w1o"]], axis=1)
    shared_scratch = [
        pltpu.VMEM((4, M, 128), cdtype),        # stage-1 haloed classes
    ]
    if variant in ("stacked", "stacked1"):
        shared_scratch += [
            pltpu.VMEM((12 * M, KP1), cdtype),      # stacked stage-1 patch
            pltpu.VMEM((12 * M, 256), jnp.float32),  # y1 (dot output)
            pltpu.VMEM((M, 768), cdtype),           # c1p (parity halves)
        ]
    else:
        shared_scratch += [
            pltpu.VMEM((M, KP1), cdtype),           # stage-1 patch
            pltpu.VMEM((M, 768), cdtype),           # c1p (parity halves)
        ]
    if variant == "wide":
        w2_key, w2_shape = "w2", (1152, 768)
        stage2_scratch = [
            pltpu.VMEM((M, 1536), cdtype),      # stage-2 4-view patch
        ]
    elif variant == "stacked":
        w2_key, w2_shape = "w2t", (512, 256)
        stage2_scratch = [
            pltpu.VMEM((M, 512), cdtype),            # hE (16-lane halos)
            pltpu.VMEM((M, 512), cdtype),            # hO
            pltpu.VMEM((6 * M, 512), cdtype),        # stacked patch (s3
            pltpu.VMEM((6 * M, 256), jnp.float32),   # y2   reuses [0:3M])
        ]
    else:
        w2_key, w2_shape = "w2t", (512, 256)
        stage2_scratch = [
            pltpu.VMEM((M, 512), cdtype),       # hE (16-lane halos)
            pltpu.VMEM((M, 512), cdtype),       # hO
            pltpu.VMEM((M, 512), cdtype),       # stage-2 tile patch
        ]
    if variant in ("tiled3", "stacked", "stacked1"):
        # stage-3 tiling reuses hE (+ p2t / the stacked patch) buffers
        w3_key, w3_shape, b3_key, b3_shape = "w3t", (512, 256), "b3t", (1, 256)
        stage3_scratch = [
            pltpu.VMEM((M, 768), jnp.float32),  # c3 (w*32+co padded layout)
        ]
    else:
        w3_key, w3_shape, b3_key, b3_shape = "w3", (1152, 576), "b3", (1, 576)
        stage3_scratch = [
            pltpu.VMEM((M, 1152), cdtype),      # stage-3 patch
            pltpu.VMEM((M, 576), jnp.float32),  # c3 (f32 for mean/fc)
        ]
    out = pl.pallas_call(
        kernel,
        grid=(N_pad // F,),
        in_specs=[spec_in] + [
            const((KP1, 256)), const((1, 384)),
            const(w2_shape), const((1, 384)),
            const(w3_shape), const(b3_shape),
            const((C3, emb)), const((1, emb)),
        ],
        out_specs=pl.BlockSpec((F, emb), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N_pad, emb), jnp.float32),
        scratch_shapes=shared_scratch + stage2_scratch + [
            pltpu.VMEM((M, 384), cdtype),       # c2
        ] + stage3_scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(x_in, w1.astype(cdtype), packed["b1"],
      cast(w2_key), packed["b2"],
      cast(w3_key), packed[b3_key], packed["fc_w"], packed["fc_b"])
    return out[:N]
