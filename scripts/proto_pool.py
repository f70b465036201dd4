"""Prototype: faster 2x2 max-pool backward for training.

jax.profiler trace of the train step (scripts/profile_train.py) shows XLA's
select-and-scatter (the reduce-window-max gradient) costs ~6.1 ms/step at
B=256 — ~19% of the 33 ms step. Candidates measured here on the real pool
shapes ((B*T, 48, 96, 8) then (B*T, 24, 48, 16)):

  a. reduce_window max (current)            — baseline fwd+bwd
  b. reshape-max: x.reshape(N,Ho,2,Wo,2,C).max((2,4)) — jax's reduce_max VJP
     (equal-split on ties)
  c. custom first-match VJP: forward = reduce_window; backward routes grad to
     the first max in window order (torch semantics), via 4 shifted
     comparisons — all elementwise.

OUTCOME (v5e-1, measured): no win — select-and-scatter is already at its
practical bound on these shapes. pool1 (8192,48,96,8) fwd+bwd: current
10.69 ms, reshape-max 12.98 ms (0.82x), firstmatch VJP 10.67 ms (1.00x);
pool2 (8192,24,48,16): 5.69 / 6.97 / 5.83 ms. The cost is the ~4 GB of f32
activation traffic per pool fwd+bwd (HBM roofline ~5 ms for pool1), not the
scatter algorithm. Retired; training keeps reduce_window.

Usage: python scripts/proto_pool.py
"""

from __future__ import annotations

import sys as _sys, pathlib as _pathlib  # _REPO_ROOT_BOOTSTRAP: run without PYTHONPATH
_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parent.parent))

import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from silent_speech_tpu.ops.nn import max_pool_2x2

N_FRAMES = 8192


def pool_reshape(x):
    N, H, W, C = x.shape
    return x.reshape(N, H // 2, 2, W // 2, 2, C).max(axis=(2, 4))


@jax.custom_vjp
def pool_firstmatch(x):
    return max_pool_2x2(x)


def _pf_fwd(x):
    y = max_pool_2x2(x)
    return y, (x, y)


def _pf_bwd(res, g):
    x, y = res
    N, H, W, C = x.shape
    xr = x.reshape(N, H // 2, 2, W // 2, 2, C)
    slabs = [xr[:, :, dy, :, dx, :] for dy in (0, 1) for dx in (0, 1)]
    taken = jnp.zeros_like(y, dtype=bool)
    gs = []
    for s in slabs:
        hit = (s == y) & ~taken
        gs.append(jnp.where(hit, g, 0.0))
        taken = taken | hit
    gx = jnp.stack(
        [jnp.stack([gs[0], gs[1]], axis=3), jnp.stack([gs[2], gs[3]], axis=3)],
        axis=2,
    )  # (N, Ho, 2, Wo, 2, C)
    return (gx.reshape(N, H, W, C),)


pool_firstmatch.defvjp(_pf_fwd, _pf_bwd)


def timed_grad(pool, x, iters=30):
    def loss(x):
        return jnp.sum(pool(x) ** 2)

    gf = jax.grad(loss)

    @partial(jax.jit, static_argnames=("n",))
    def loop(x, n):
        def body(c, _):
            g = gf(c)
            eps = (g.reshape(-1)[0] * 1e-30).astype(c.dtype)
            return c + eps, g.reshape(-1)[0]
        c, outs = lax.scan(body, x, None, length=n)
        return outs[-1] + c.reshape(-1)[0]

    float(loop(x, 2))
    float(loop(x, iters))
    t0 = time.perf_counter()
    float(loop(x, iters))
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.default_rng(0)
    for shape in ((N_FRAMES, 48, 96, 8), (N_FRAMES, 24, 48, 16)):
        x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        x = jax.nn.relu(x)  # realistic: post-ReLU, many exact-zero ties
        print(f"shape {shape}:", flush=True)

        # parity of forward + backward-vs-torch-semantics spot check (CPU-ok)
        y_ref = max_pool_2x2(x[:8])
        for name, pool in (("reshape", pool_reshape),
                           ("firstmatch", pool_firstmatch)):
            err = float(jnp.max(jnp.abs(pool(x[:8]) - y_ref)))
            print(f"  fwd parity {name}: {err:.1e}", flush=True)

        base = None
        for name, pool in (("reduce_window (current)", max_pool_2x2),
                           ("reshape-max", pool_reshape),
                           ("firstmatch custom vjp", pool_firstmatch)):
            try:
                dt = timed_grad(pool, x)
                if base is None:
                    base = dt
                print(f"  {name:>24s}: fwd+bwd {dt*1e3:8.3f} ms  "
                      f"{base/dt:5.2f}x", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"  {name:>24s}: FAILED {type(e).__name__}: "
                      f"{str(e).splitlines()[0][:140]}", flush=True)


if __name__ == "__main__":
    main()
