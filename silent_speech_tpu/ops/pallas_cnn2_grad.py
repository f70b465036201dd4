"""Training backward for the parity-packed fused TinyROICNN kernel.

docs/TRAIN_PERF.md's conclusion: the official train step is bound by the
ROI-CNN's *activation* HBM traffic — the f32 (8192,48,96,8) intermediates
cost ~31 of 32.9 ms/step at B=256, and every XLA-level attack (custom pool
VJP, grouped conv, remat) measured at or above that roofline because the
bytes themselves are the price. The only remaining lever (its words) was
"not materializing the activations at all".

This module does exactly that: a custom VJP for the fused forward
(ops/pallas_cnn2.py, tiled3 scheme) whose backward is ONE Pallas program
that recomputes the activations tile-by-tile in VMEM and emits ONLY packed
weight gradients. The CNN input is data (never differentiated), so no
input cotangent is written — the backward's HBM traffic is the uint8 input
+ the (N, emb) output cotangent + a few hundred KB of weight grads, i.e.
~40 MB instead of XLA's multi-GB activation round trips.

Gradient semantics match the XLA path (conv+bias -> ReLU -> 2x2 maxpool,
lax.reduce_window VJP == torch MaxPool2d backward):

- maxpool ties route ALL gradient to the FIRST max in row-major window
  order ((2p,2q), (2p,2q+1), (2p+1,2q), (2p+1,2q+1)); in the parity
  packing those four candidates are exactly (yE-even, yE-odd, yO-even,
  yO-odd), so first-match masks are four elementwise compares.
- ReLU'(0) = 0 (jax.nn.relu's custom JVP; torch semantics): the mask is
  (post-ReLU activation > 0), applied before pool routing — equivalent to
  relu-then-pool because ReLU is monotone and bias is window-constant.
- Weight grads are computed in PACKED space (dW = patch^T @ dy, the same
  layouts the forward's dots use); JAX's autodiff of the traceable pack
  (a scatter) transposes them back to HWIO for free.

Reference protocol: train_model_official.py:426-443 (the inner loop this
accelerates); architecture train_model_official.py:209-229.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_cnn2 import (
    C3,
    F_TILE,
    H0,
    HQ,
    KP1,
    W0,
    W2P,
    _front_classes,
    _front_widen,
    _iota2,
    _shift_down,
    _shift_up,
    pack_roi_cnn_fused_traceable,
    roi_cnn_fused,
)


def _tdot(a, b):
    """dW = a^T @ b contracting the sublane (row) axis — the weight-grad
    form. Measured on-chip at the same rate as the equivalent standard-form
    dot (scripts/proto_bwd_dots3.py), so no pre-transposed patch needed."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _dot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _roi_fused_bwd_kernel(standardize: bool, F: int,
                          x_ref, de_ref,
                          w1_ref, b1_ref, w2t_ref, b2_ref, w3t_ref, b3t_ref,
                          w2tT_ref, w3tT_ref, fcwT_ref,
                          dw1_ref, db1_ref, dw2t_ref, db2_ref,
                          dw3t_ref, db3t_ref, dfcw_ref, dfcb_ref,
                          halo_ref, p1_ref, y1_ref, c1_ref,
                          he_ref, ho_ref, p2t_ref, y2e_ref, y2o_ref, c2_ref,
                          h3_ref, c3_ref,
                          dy_ref, dc1_ref, dc2_ref, dc3_ref,
                          dA_ref, dB_ref, dC_ref, dD_ref):
    M = F * HQ
    kk = _iota2((M, 1), 0) % HQ

    @pl.when(pl.program_id(0) == 0)
    def _zero_grads():
        for r in (dw1_ref, db1_ref, dw2t_ref, db2_ref, dw3t_ref, db3t_ref,
                  dfcw_ref, dfcb_ref):
            r[...] = jnp.zeros_like(r)

    # ---- recompute the forward, tile-resident (tiled3 scheme, f32) ----
    # Identical op sequence to _roi_fused_kernel's tiled3 path (shared
    # front helpers), so the recomputed activations — and therefore the
    # pool argmasks — are bitwise those of the fused forward.
    xs = _front_classes(_front_widen(x_ref, "u8"), standardize, F)
    for c in range(4):
        halo_ref[c] = jnp.zeros_like(halo_ref[c])
        halo_ref[c, :, 1:1 + W0] = xs[c]
    x3d = _shift_down(halo_ref[3][...], kk)
    x0u = _shift_up(halo_ref[0][...], kk)
    views = [
        (x3d, halo_ref[0][...], halo_ref[1][...]),
        (halo_ref[0][...], halo_ref[1][...], halo_ref[2][...]),
        (halo_ref[1][...], halo_ref[2][...], halo_ref[3][...]),
        (halo_ref[2][...], halo_ref[3][...], x0u),
    ]

    def fill_p1(c, j):
        for dy_i in range(3):
            p1_ref[:, dy_i * 34: dy_i * 34 + 34] = (
                views[c][dy_i][:, 32 * j: 32 * j + 34])

    b1 = b1_ref[...]
    p1_ref[:, 3 * 34:] = jnp.zeros_like(p1_ref[:, 3 * 34:])
    bases = ((0, (0, 1)), (384, (2, 3)))
    for base, (ca, cb) in bases:
        for c in (ca, cb):
            for j in range(3):
                fill_p1(c, j)
                y = _dot(p1_ref[...], w1_ref[...])
                y1_ref[:, (c * 3 + j) * 256: (c * 3 + j + 1) * 256] = y
                m = jnp.maximum(y[:, 0:128], y[:, 128:256])
                sl = slice(base + 128 * j, base + 128 * (j + 1))
                if c == ca:
                    c1_ref[:, sl] = m
                else:
                    c1_ref[:, sl] = jnp.maximum(c1_ref[:, sl], m)
        osl = slice(base, base + 384)
        c1_ref[:, osl] = jnp.maximum(c1_ref[:, osl] + b1, 0.0)

    ve = c1_ref[:, 0:384]
    vo = c1_ref[:, 384:768]
    he_ref[...] = jnp.zeros_like(he_ref[...])
    ho_ref[...] = jnp.zeros_like(ho_ref[...])
    he_ref[:, 16:400] = ve
    ho_ref[:, 16:400] = vo
    hE = he_ref[...]
    hO = ho_ref[...]
    vOd = _shift_down(hO, kk)
    vEu = _shift_up(hE, kk)
    b2t = b2_ref[:, 0:128]
    p2t_ref[:, 480:] = jnp.zeros_like(p2t_ref[:, 480:])
    E_VIEWS = ((0, vOd), (1, hE), (2, hO))     # output rows 2p
    O_VIEWS = ((0, hE), (1, hO), (2, vEu))     # output rows 2p+1

    def fill_p2(viewset, sl):
        for dy_i, view in viewset:
            p2t_ref[:, dy_i * 160: dy_i * 160 + 160] = view[:, sl]

    for j in range(3):
        sl = slice(128 * j, 128 * j + 160)
        fill_p2(E_VIEWS, sl)
        yE = _dot(p2t_ref[...], w2t_ref[...])
        y2e_ref[:, 256 * j: 256 * (j + 1)] = yE
        fill_p2(O_VIEWS, sl)
        yO = _dot(p2t_ref[...], w2t_ref[...])
        y2o_ref[:, 256 * j: 256 * (j + 1)] = yO
        c2_ref[:, 128 * j: 128 * (j + 1)] = jnp.maximum(
            jnp.maximum(jnp.maximum(yE[:, 0:128], yE[:, 128:256]),
                        jnp.maximum(yO[:, 0:128], yO[:, 128:256]))
            + b2t, 0.0)

    h3_ref[...] = jnp.zeros_like(h3_ref[...])
    h3_ref[:, 16:400] = c2_ref[...]
    h3 = h3_ref[...]
    v3d = _shift_down(h3, kk)
    v3u = _shift_up(h3, kk)
    b3 = b3t_ref[...]
    S3_VIEWS = ((0, v3d), (1, h3), (2, v3u))
    for j in range(3):
        sl = slice(128 * j, 128 * j + 160)
        fill_p2(S3_VIEWS, sl)
        y = _dot(p2t_ref[...], w3t_ref[...])
        c3_ref[:, 256 * j: 256 * (j + 1)] = jnp.maximum(y + b3, 0.0)

    # mean + fc forward values needed by the fc grads
    sfr = (_iota2((F, M), 1) // HQ == _iota2((F, M), 0)).astype(jnp.float32)
    L3 = W2P * 32
    scol = (_iota2((L3, C3), 0) % 32 == _iota2((L3, C3), 1)).astype(
        jnp.float32)
    inv_n = 1.0 / (HQ * W2P)
    feat = _dot(_dot(sfr, c3_ref[...]), scol) * inv_n          # (F, C3)

    # ---- backward ----
    dE = de_ref[...]                                            # (F, emb)
    dfcb_ref[...] += jnp.sum(dE, axis=0, keepdims=True)
    dfcw_ref[...] += _tdot(feat, dE)                            # (C3, emb)
    dfeat = _dot(dE, fcwT_ref[...])                             # (F, C3)
    scolT = (_iota2((C3, L3), 1) % 32 == _iota2((C3, L3), 0)).astype(
        jnp.float32)
    dby = _dot(dfeat, scolT) * inv_n                            # (F, L3)
    sfrT = (_iota2((M, F), 0) // HQ == _iota2((M, F), 1)).astype(jnp.float32)
    # ReLU'(0)=0: strict > keeps exact-zero activations gradient-dead
    dc3_ref[...] = _dot(sfrT, dby) * (c3_ref[...] > 0)

    # stage 3: accumulate patch cotangents, then fold the +/-1-row shifts
    dA_ref[...] = jnp.zeros_like(dA_ref[...])                   # d v3d
    dB_ref[...] = jnp.zeros_like(dB_ref[...])                   # d h3
    dC_ref[...] = jnp.zeros_like(dC_ref[...])                   # d v3u
    for j in range(3):
        sl = slice(128 * j, 128 * j + 160)
        fill_p2(S3_VIEWS, sl)
        g = dc3_ref[:, 256 * j: 256 * (j + 1)]
        dw3t_ref[...] += _tdot(p2t_ref[...], g)
        db3t_ref[...] += jnp.sum(g, axis=0, keepdims=True)
        dp = _dot(g, w3tT_ref[...])                             # (M, 512)
        dA_ref[:, sl] += dp[:, 0:160]
        dB_ref[:, sl] += dp[:, 160:320]
        dC_ref[:, sl] += dp[:, 320:480]
    # v3d = shift_down(h3) => dh3 += shift_up(dv3d), and mirrored for v3u;
    # the halo lanes [0:16)/[400:512) were zero-padded in the forward, so
    # their cotangent is discarded by the [16:400] slice.
    dh3 = (dB_ref[...] + _shift_up(dA_ref[...], kk)
           + _shift_down(dC_ref[...], kk))
    # pool-input grad gate for stage 2 in one step: (c2 > 0) is the ReLU
    # mask (bias is window-constant, ReLU monotone — see module docstring)
    dc2_ref[...] = dh3[:, 16:400] * (c2_ref[...] > 0)

    # stage 2: first-match 2x2 pool routing + packed weight grads
    dA_ref[...] = jnp.zeros_like(dA_ref[...])                   # d hE
    dB_ref[...] = jnp.zeros_like(dB_ref[...])                   # d hO
    dC_ref[...] = jnp.zeros_like(dC_ref[...])                   # d vOd
    dD_ref[...] = jnp.zeros_like(dD_ref[...])                   # d vEu
    for j in range(3):
        sl = slice(128 * j, 128 * j + 160)
        yE = y2e_ref[:, 256 * j: 256 * (j + 1)]
        yO = y2o_ref[:, 256 * j: 256 * (j + 1)]
        yEe, yEo = yE[:, 0:128], yE[:, 128:256]
        yOe, yOo = yO[:, 0:128], yO[:, 128:256]
        mx = jnp.maximum(jnp.maximum(yEe, yEo), jnp.maximum(yOe, yOo))
        g = dc2_ref[:, 128 * j: 128 * (j + 1)]
        db2_ref[:, 0:128] += jnp.sum(g, axis=0, keepdims=True)
        # row-major window order (2p,2q),(2p,2q+1),(2p+1,2q),(2p+1,2q+1)
        # == (E-even, E-odd, O-even, O-odd); first match takes the grad
        m1 = yEe == mx
        m2 = (yEo == mx) & ~m1
        m12 = m1 | m2
        m3 = (yOe == mx) & ~m12
        m4 = (yOo == mx) & ~(m12 | m3)
        zero = jnp.zeros_like(g)
        dy_ref[:, 0:128] = jnp.where(m1, g, zero)
        dy_ref[:, 128:256] = jnp.where(m2, g, zero)
        fill_p2(E_VIEWS, sl)
        dw2t_ref[...] += _tdot(p2t_ref[...], dy_ref[...])
        dp = _dot(dy_ref[...], w2tT_ref[...])
        dC_ref[:, sl] += dp[:, 0:160]
        dA_ref[:, sl] += dp[:, 160:320]
        dB_ref[:, sl] += dp[:, 320:480]
        dy_ref[:, 0:128] = jnp.where(m3, g, zero)
        dy_ref[:, 128:256] = jnp.where(m4, g, zero)
        fill_p2(O_VIEWS, sl)
        dw2t_ref[...] += _tdot(p2t_ref[...], dy_ref[...])
        dp = _dot(dy_ref[...], w2tT_ref[...])
        dA_ref[:, sl] += dp[:, 0:160]
        dB_ref[:, sl] += dp[:, 160:320]
        dD_ref[:, sl] += dp[:, 320:480]
    dhE = dA_ref[...] + _shift_down(dD_ref[...], kk)
    dhO = dB_ref[...] + _shift_up(dC_ref[...], kk)
    dc1_ref[:, 0:384] = dhE[:, 16:400]
    dc1_ref[:, 384:768] = dhO[:, 16:400]
    dc1p = dc1_ref[...] * (c1_ref[...] > 0)
    dc1_ref[...] = dc1p
    db1_ref[...] += (jnp.sum(dc1p[:, 0:384], axis=0, keepdims=True)
                     + jnp.sum(dc1p[:, 384:768], axis=0, keepdims=True))

    # stage 1: h-parity x w-parity first-match routing; no input grads
    for base, (ca, cb) in bases:
        for j in range(3):
            ia = (ca * 3 + j) * 256
            ib = (cb * 3 + j) * 256
            yA = y1_ref[:, ia: ia + 256]
            yB = y1_ref[:, ib: ib + 256]
            yAe, yAo = yA[:, 0:128], yA[:, 128:256]
            yBe, yBo = yB[:, 0:128], yB[:, 128:256]
            mx = jnp.maximum(jnp.maximum(yAe, yAo), jnp.maximum(yBe, yBo))
            g = dc1_ref[:, base + 128 * j: base + 128 * (j + 1)]
            m1 = yAe == mx
            m2 = (yAo == mx) & ~m1
            m12 = m1 | m2
            m3 = (yBe == mx) & ~m12
            m4 = (yBo == mx) & ~(m12 | m3)
            zero = jnp.zeros_like(g)
            dy_ref[:, 0:128] = jnp.where(m1, g, zero)
            dy_ref[:, 128:256] = jnp.where(m2, g, zero)
            fill_p1(ca, j)
            dw1_ref[...] += _tdot(p1_ref[...], dy_ref[...])
            dy_ref[:, 0:128] = jnp.where(m3, g, zero)
            dy_ref[:, 128:256] = jnp.where(m4, g, zero)
            fill_p1(cb, j)
            dw1_ref[...] += _tdot(p1_ref[...], dy_ref[...])


@functools.partial(jax.jit,
                   static_argnames=("standardize", "f_tile", "interpret"))
def _fused_bwd_call(roi_u8, dE, cw, *, standardize, f_tile, interpret):
    """Runs the backward kernel; returns the packed-space grad dict."""
    N = roi_u8.shape[0]
    emb = cw["fc_w"].shape[-1]
    N_pad = -(-N // f_tile) * f_tile
    if N_pad != N:
        # padded frames carry zero cotangent -> zero grad contributions
        roi_u8 = jnp.pad(roi_u8, ((0, N_pad - N), (0, 0), (0, 0)))
        dE = jnp.pad(dE, ((0, N_pad - N), (0, 0)))
    x_in = roi_u8.reshape(N_pad * HQ, 4 * W0)

    F = f_tile
    M = F * HQ
    kernel = functools.partial(_roi_fused_bwd_kernel, standardize, F)
    const = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                       memory_space=pltpu.VMEM)
    f32 = jnp.float32
    grads = pl.pallas_call(
        kernel,
        grid=(N_pad // F,),
        in_specs=[
            pl.BlockSpec((M, 4 * W0), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((F, emb), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            const((KP1, 256)), const((1, 384)),
            const((512, 256)), const((1, 384)),
            const((512, 256)), const((1, 256)),
            const((256, 512)), const((256, 512)), const((emb, C3)),
        ],
        out_specs=tuple(const(s) for s in (
            (KP1, 256), (1, 384), (512, 256), (1, 384),
            (512, 256), (1, 256), (C3, emb), (1, emb))),
        out_shape=tuple(jax.ShapeDtypeStruct(s, f32) for s in (
            (KP1, 256), (1, 384), (512, 256), (1, 384),
            (512, 256), (1, 256), (C3, emb), (1, emb))),
        scratch_shapes=[
            pltpu.VMEM((4, M, 128), f32),    # halo classes
            pltpu.VMEM((M, KP1), f32),       # p1 patch
            pltpu.VMEM((M, 3072), f32),      # y1: stage-1 dots, all (c, j)
            pltpu.VMEM((M, 768), f32),       # c1 (parity halves)
            pltpu.VMEM((M, 512), f32),       # hE
            pltpu.VMEM((M, 512), f32),       # hO
            pltpu.VMEM((M, 512), f32),       # p2t patch (stages 2+3)
            pltpu.VMEM((M, 768), f32),       # y2E per tile
            pltpu.VMEM((M, 768), f32),       # y2O per tile
            pltpu.VMEM((M, 384), f32),       # c2
            pltpu.VMEM((M, 512), f32),       # h3 (c2 halo)
            pltpu.VMEM((M, 768), f32),       # c3 (w*32+co layout)
            pltpu.VMEM((M, 256), f32),       # dy (routed pool cotangent)
            pltpu.VMEM((M, 768), f32),       # dc1
            pltpu.VMEM((M, 384), f32),       # dc2
            pltpu.VMEM((M, 768), f32),       # dc3
            pltpu.VMEM((M, 512), f32),       # dA   (shift-class cotangent
            pltpu.VMEM((M, 512), f32),       # dB    accumulators, reused
            pltpu.VMEM((M, 512), f32),       # dC    by stages 3 then 2)
            pltpu.VMEM((M, 512), f32),       # dD
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(x_in, dE,
      cw["w1"], cw["b1"], cw["w2t"], cw["b2"], cw["w3t"], cw["b3t"],
      jnp.transpose(cw["w2t"]), jnp.transpose(cw["w3t"]),
      jnp.transpose(cw["fc_w"]))
    keys = ("w1", "b1", "w2t", "b2", "w3t", "b3t", "fc_w", "fc_b")
    return dict(zip(keys, grads))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _fused_core(roi_u8, cw, standardize, f_tile, interpret):
    out, _ = _fused_core_fwd(roi_u8, cw, standardize, f_tile, interpret)
    return out


def _fused_core_fwd(roi_u8, cw, standardize, f_tile, interpret):
    pdict = {
        "w1e": cw["w1"][:, 0:128], "w1o": cw["w1"][:, 128:256],
        "b1": cw["b1"], "w2t": cw["w2t"], "b2": cw["b2"],
        "w3t": cw["w3t"], "b3t": cw["b3t"],
        "fc_w": cw["fc_w"], "fc_b": cw["fc_b"],
    }
    out = roi_cnn_fused(roi_u8, pdict, standardize=standardize,
                        variant="tiled3", f_tile=f_tile, interpret=interpret)
    return out, (roi_u8, cw)


def _fused_core_bwd(standardize, f_tile, interpret, res, dE):
    roi_u8, cw = res
    d_cw = _fused_bwd_call(roi_u8, dE, cw, standardize=standardize,
                           f_tile=f_tile, interpret=interpret)
    if jnp.issubdtype(roi_u8.dtype, jnp.inexact):
        d_roi = jnp.zeros_like(roi_u8)
    else:
        # integer primal -> float0 cotangent (the input is data)
        d_roi = np.zeros(roi_u8.shape, dtype=jax.dtypes.float0)
    return (d_roi, d_cw)


_fused_core.defvjp(_fused_core_fwd, _fused_core_bwd)


def roi_cnn_fused_train(
    roi_u8: jnp.ndarray,
    params: dict,
    *,
    standardize: bool = True,
    f_tile: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Differentiable fused TinyROICNN: (N, 48, 96) frames -> (N, emb) f32.

    Forward = ``roi_cnn_fused`` (tiled3); backward = the recompute-in-VMEM
    kernel above, emitting weight grads only (the frame input gets a zero/
    float0 cotangent — it is data). ``params`` is the roi_cnn pytree
    (models/bigru.py layout); packing happens inline under jit (traceable
    scatters) and JAX transposes it automatically, so grads arrive in the
    true HWIO layout.
    """
    if tuple(roi_u8.shape[1:]) != (H0, W0):
        raise ValueError(
            f"roi_impl='fused' training supports only the reference "
            f"{H0}x{W0} ROI (got {tuple(roi_u8.shape[1:])}); use "
            "roi_impl='xla' for other geometries")
    if interpret is None:
        from .pallas_gru import default_interpret

        interpret = default_interpret()
    ft = F_TILE if f_tile is None else f_tile
    packed = pack_roi_cnn_fused_traceable(params)
    cw = {
        "w1": jnp.concatenate([packed["w1e"], packed["w1o"]], axis=1),
        "b1": packed["b1"], "w2t": packed["w2t"], "b2": packed["b2"],
        "w3t": packed["w3t"], "b3t": packed["b3t"],
        "fc_w": packed["fc_w"], "fc_b": packed["fc_b"],
    }
    return _fused_core(roi_u8, cw, standardize, ft, interpret)
