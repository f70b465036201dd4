"""Measure stream_bf16 on the Pallas GRU kernel (VERDICT r2 item 7).

Streams the input block into VMEM as bf16 (half the x DMA bytes, f32 math)
vs the default f32 stream, at the official shapes AND at scaled shapes
(H=1024) where the input DMA is no longer negligible. Ship or retire with a
line in docs/GRU_PERF.md.

Usage: PYTHONPATH=.:$PYTHONPATH python scripts/proto_gru_bf16x.py
"""

from __future__ import annotations

import sys as _sys, pathlib as _pathlib  # _REPO_ROOT_BOOTSTRAP: run without PYTHONPATH
_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parent.parent))

import json
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from silent_speech_tpu.ops.nn import gru_dir_init
from silent_speech_tpu.ops.pallas_gru import gru_sequence_pallas

ITERS = 100


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
    rng = np.random.default_rng(0)
    out = {}
    for tag, B, T, D, H, TB in (
        # batch_tile shrinks at H=1024: wi/wh alone are 24 MB of VMEM, so
        # TB=512 blocks overflow the 128 MB budget (measured OOM at 130.5M)
        ("official B512 T32 D372 H192", 512, 32, 372, 192, 512),
        ("scaled   B512 T32 D1024 H1024", 512, 32, 1024, 1024, 128),
        ("scaled   B128 T128 D1024 H1024", 128, 128, 1024, 1024, 128),
    ):
        p = gru_dir_init(jax.random.PRNGKey(0), D, H)
        p = jax.tree.map(jnp.asarray, p)
        x = jnp.asarray(rng.standard_normal((B, T, D)).astype(np.float32))
        L = jnp.asarray(np.full(B, T, np.int32))
        row = {}
        for sb in (False, True):
            fn = lambda x, _sb=sb: gru_sequence_pallas(
                x, L, p["wi"], p["bi"], p["wh"], p["bh"],
                interpret=False, stream_bf16=_sb, batch_tile=TB)
            # numerics check once
            if sb:
                a = np.asarray(gru_sequence_pallas(
                    x, L, p["wi"], p["bi"], p["wh"], p["bh"],
                    interpret=False, batch_tile=TB))
                b = np.asarray(fn(x))
                row["max_dy_bf16_stream"] = float(np.abs(a - b).max())
            row["bf16" if sb else "f32"] = timeit(fn, x) * 1e3
        row["speedup"] = row["f32"] / row["bf16"]
        out[tag] = {k: (round(v, 4) if isinstance(v, float) else v)
                    for k, v in row.items()}
        print(tag, out[tag], flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
