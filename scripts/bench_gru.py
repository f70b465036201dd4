"""GRU micro-benchmark: scan vs Pallas sequence kernel on the real chip.

VERDICT r1 item 6: make the Pallas GRU pay rent — >=1.3x over the scan at
B=512/T=32 inference, or a measured write-up retiring the idea.

Times the full model-shaped stack (2 layers, bidirectional, H=192) and the
single-direction primitive, using the bench.py methodology: the timing loop
is a lax.scan *inside* one jit with a runtime-zero feedback term, so one
dispatch covers ITERS iterations and XLA cannot hoist anything.

Usage: python scripts/bench_gru.py [B] [T]
"""

from __future__ import annotations

import sys as _sys, pathlib as _pathlib  # _REPO_ROOT_BOOTSTRAP: run without PYTHONPATH
_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parent.parent))

import sys
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from silent_speech_tpu.ops import gru as gru_scan
from silent_speech_tpu.ops import pallas_gru

ITERS = 100


def timeit(fn, x, iters=ITERS):
    """Time fn(x)->(B,T,H...) chained iters times inside one jit."""

    @partial(jax.jit, static_argnames=("n",))
    def loop(x, n):
        def body(carry, _):
            y = fn(carry)
            out = jnp.asarray(y[0][0, 0, 0] if isinstance(y, tuple) else y[0, 0, 0],
                              jnp.float32)
            eps = (out * 1e-30).astype(carry.dtype)
            return carry + eps, out

        xf, outs = lax.scan(body, x, None, length=n)
        return outs[-1] + jnp.asarray(xf[0, 0, 0], jnp.float32)

    float(loop(x, 2))  # compile
    float(loop(x, iters))  # warm
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

    # parity check first (live path shapes)
    y_ref, _ = gru_scan.bigru(x, lengths, layers)
    y_pal = pallas_gru.bigru_pallas(x, lengths, layers)
    err = float(jnp.max(jnp.abs(y_ref - y_pal)))
    print(f"pallas-vs-scan max err: {err:.2e}", flush=True)

    dt = timeit(lambda xc: gru_scan.bigru(xc, lengths, layers)[0], x)
    base = dt
    print(f"scan  full stack: {dt*1e3:8.3f} ms   1.00x", flush=True)

    for name, fn in [
        ("pallas tb=128", lambda xc: pallas_gru.bigru_pallas(xc, lengths, layers)),
        ("pallas tb=256", lambda xc: pallas_gru.bigru_pallas(
            xc, lengths, layers, batch_tile=256)),
        ("pallas tb=512", lambda xc: pallas_gru.bigru_pallas(
            xc, lengths, layers, batch_tile=512)),
    ]:
        try:
            dt = timeit(fn, x)
            print(f"{name:>18s}: {dt*1e3:8.3f} ms   {base/dt:.2f}x", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:>18s}: FAILED {type(e).__name__}: {e}", flush=True)

    # single-direction primitive, B=512 T=32 (the VERDICT target shape)
    p = layers[0]["fwd"]
    dt = timeit(lambda xc: gru_scan.gru_layer_single_direction(xc, lengths, p)[0], x)
    base1 = dt
    print(f"scan  single dir: {dt*1e3:8.3f} ms   1.00x", flush=True)
    dt = timeit(lambda xc: pallas_gru.gru_layer_pallas(xc, lengths, p), x)
    print(f"pallas single dir: {dt*1e3:8.3f} ms   {base1/dt:.2f}x", flush=True)


if __name__ == "__main__":
    main()
