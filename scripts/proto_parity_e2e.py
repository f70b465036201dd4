"""End-to-end parity ROI-CNN prototype: fused conv1+pool1 Pallas kernel with
free-reshape output + grouped-conv back half. Times against the shipped
grouped path and checks exactness on CPU.

Key layout trick: the kernel writes ONE (N*12, 768) array with pooled rows
m=2k (m-even) in lanes [0:384) and m=2k+1 in [384:768) of row k; the row-major
reshape to (N, 24, 48, 8) is then pure metadata — the XLA interleave (measured
10-19 ms for any stack/concat variant!) disappears entirely.
"""

from __future__ import annotations

import sys as _sys, pathlib as _pathlib  # _REPO_ROOT_BOOTSTRAP: run without PYTHONPATH
_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parent.parent))

import functools
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F, HQ, W1, KP = 16, 12, 96, 104


def pack_parity_conv1(k, b, scale=1.0 / 255.0):
    k = np.asarray(k, np.float32) * scale
    WE = np.zeros((KP, 128), np.float32)
    WO = np.zeros((KP, 128), np.float32)
    for t in range(16):
        for co in range(8):
            col = t * 8 + co
            for dy in range(3):
                for dx in range(3):
                    WE[dy * 34 + 2 * t + dx, col] = k[dy, dx, 0, co]
                    WO[dy * 34 + 2 * t + 1 + dx, col] = k[dy, dx, 0, co]
    bias = np.tile(np.asarray(b, np.float32), 48)[None, :]
    return WE, WO, bias


def _kernel(x0_ref, x1_ref, x2_ref, x3_ref, we_ref, wo_ref, b_ref,
            out_ref, halo_ref, patch_ref):
    M = x0_ref.shape[0]
    xs = [r[...].astype(jnp.int32).astype(jnp.float32)
          for r in (x0_ref, x1_ref, x2_ref, x3_ref)]
    for c in range(4):
        halo_ref[c] = jnp.zeros_like(halo_ref[c])
        halo_ref[c, :, 1:97] = xs[c]
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
    for base, (ca, cb) in ((0, (0, 1)), (384, (2, 3))):
        for c in (ca, cb):
            for j in range(3):
                for dy in range(3):
                    patch_ref[:, dy * 34: dy * 34 + 34] = (
                        views[c][dy][:, 32 * j: 32 * j + 34])
                p = patch_ref[...]
                ye = jnp.dot(p, we_ref[...], preferred_element_type=jnp.float32)
                yo = jnp.dot(p, wo_ref[...], preferred_element_type=jnp.float32)
                m = jnp.maximum(ye, yo)
                sl = slice(base + 128 * j, base + 128 * (j + 1))
                if c == ca:
                    out_ref[:, sl] = m
                else:
                    out_ref[:, sl] = jnp.maximum(out_ref[:, sl], m)
        osl = slice(base, base + 384)
        out_ref[:, osl] = jnp.maximum(out_ref[:, osl] + bias, 0.0)


@functools.partial(jax.jit, static_argnames=("interpret", "out_dtype"))
def conv1pool1(x0, x1, x2, x3, WE, WO, bias, *, interpret=False,
               out_dtype=jnp.float32):
    N = x0.shape[0] // HQ
    spec_in = pl.BlockSpec((F * HQ, W1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    spec_w = pl.BlockSpec((KP, 128), lambda i: (0, 0), memory_space=pltpu.VMEM)
    spec_b = pl.BlockSpec((1, 384), lambda i: (0, 0), memory_space=pltpu.VMEM)
    spec_out = pl.BlockSpec((F * HQ, 768), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _kernel,
        grid=(N // F,),
        in_specs=[spec_in] * 4 + [spec_w, spec_w, spec_b],
        out_specs=spec_out,
        out_shape=jax.ShapeDtypeStruct((N * HQ, 768), jnp.float32),
        scratch_shapes=[pltpu.VMEM((4, F * HQ, 128), jnp.float32),
                        pltpu.VMEM((F * HQ, KP), jnp.float32)],
        interpret=interpret,
    )(x0, x1, x2, x3, WE, WO, bias)
    return out.astype(out_dtype).reshape(N, 24, 48, 8)  # FREE reshape


def roi_cnn_parity(cnn, roi_u8, WE, WO, bias, *, group=16,
                   interpret=False, compute_dtype=jnp.float32):
    """Full TinyROICNN: parity kernel front + grouped-conv back half."""
    from silent_speech_tpu.ops.grouped_cnn import _grouped_conv, _pool

    n = roi_u8.shape[0]
    parts = [roi_u8[:, c::4].reshape(n * HQ, W1) for c in range(4)]
    pooled1 = conv1pool1(*parts, WE, WO, bias, interpret=interpret,
                         out_dtype=compute_dtype)
    G = group
    h = pooled1.reshape(n // G, G, 24, 48, 8).transpose(0, 2, 3, 1, 4)
    h = h.reshape(n // G, 24, 48, G * 8)
    h = _pool(jax.nn.relu(_grouped_conv(h, cnn["conv1"]["w"].astype(compute_dtype),
                                        cnn["conv1"]["b"].astype(compute_dtype), G)))
    h = jax.nn.relu(_grouped_conv(h, cnn["conv2"]["w"].astype(compute_dtype),
                                  cnn["conv2"]["b"].astype(compute_dtype), G))
    feat = jnp.mean(h.astype(jnp.float32), axis=(1, 2))
    feat = feat.reshape(n // G, G, -1).reshape(n, -1)
    return feat @ cnn["fc"]["w"].astype(jnp.float32) + cnn["fc"]["b"].astype(jnp.float32)


def timed(fn, u8s, rest, iters=30):
    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(u8s, rest, n):
        def body(c, _):
            out = fn(*[x + c for x in u8s], *rest)
            return (jnp.sum(out[:1, :1]) * 1e-30).astype(jnp.uint8), out[0, 0]
        _, outs = lax.scan(body, jnp.uint8(0), None, length=n)
        return outs[-1]
    float(loop(u8s, rest, 2))
    float(loop(u8s, rest, iters))
    t0 = time.perf_counter()
    float(loop(u8s, rest, iters))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    from silent_speech_tpu.models import bigru as model
    from silent_speech_tpu.models.bigru import preprocess_roi
    from silent_speech_tpu.ops.grouped_cnn import roi_cnn_grouped

    dd = jax.config.jax_default_device
    platform = dd.platform if dd is not None else jax.default_backend()
    on_tpu = platform == "tpu"

    mcfg = model.BiGRUConfig(x_dim=180, num_classes=10, use_roi=True)
    params = model.init_params(jax.random.PRNGKey(0), mcfg)
    cnn = params["roi_cnn"]
    WE, WO, bias = pack_parity_conv1(np.asarray(cnn["conv0"]["w"]),
                                     np.asarray(cnn["conv0"]["b"]))
    WE, WO, bias = jnp.asarray(WE), jnp.asarray(WO), jnp.asarray(bias)

    rng = np.random.default_rng(0)
    n = 8192 if on_tpu else 64
    roi = rng.integers(0, 256, (n, 48, 96), dtype=np.uint8)
    roi_j = jnp.asarray(roi)

    got = np.asarray(roi_cnn_parity(cnn, roi_j, WE, WO, bias,
                                    interpret=not on_tpu))
    want = np.asarray(roi_cnn_grouped(cnn, preprocess_roi(roi_j, False)))
    err = np.abs(got - want).max()
    tol = 2e-2 if on_tpu else 1e-4
    print(f"correctness vs grouped: max|err| = {err:.2e} (tol {tol})")
    assert err < tol

    if on_tpu:
        def parity_f32(r, WEj, WOj, biasj):
            return roi_cnn_parity(cnn, r, WEj, WOj, biasj)

        def parity_bf16(r, WEj, WOj, biasj):
            return roi_cnn_parity(cnn, r, WEj, WOj, biasj,
                                  compute_dtype=jnp.bfloat16)

        def grouped_f32(r):
            return roi_cnn_grouped(cnn, preprocess_roi(r, False))

        def grouped_bf16(r):
            return roi_cnn_grouped(
                cnn, preprocess_roi(r, False).astype(jnp.bfloat16)
            ).astype(jnp.float32)

        print(f"grouped f32 : {timed(grouped_f32, [roi_j], []):6.2f} ms")
        print(f"parity  f32 : {timed(parity_f32, [roi_j], [WE, WO, bias]):6.2f} ms")
        print(f"grouped bf16: {timed(grouped_bf16, [roi_j], []):6.2f} ms")
        print(f"parity  bf16: {timed(parity_bf16, [roi_j], [WE, WO, bias]):6.2f} ms")


if __name__ == "__main__":
    main()
