"""Streaming latency benchmark (secondary metric): p50/p95 per-event latency.

Measures, on the real device:
- single-clip prediction latency (the live_infer_official predict block):
  (1, T<=90) live forward, p50/p95 over repeated calls;
- sliding-window step latency (live_feed cadence): (1, max_t, 83)
  GRUWordClassifier forward;
- per-frame carry-streaming step latency (CarryStreamingGRU).

Dispatch through the remote relay dominates single-call latency here, so each
measurement also reports the in-graph amortized time (scan of 100 steps) —
the number that matters once dispatch is pipelined.
"""

from __future__ import annotations

import json
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


def _p(xs, q):
    xs = sorted(xs)
    return xs[min(len(xs) - 1, int(q * len(xs)))]


def _amortized(fn, args, iters=100):
    @partial(jax.jit, static_argnames=())
    def loop(*a):
        def body(c, _):
            out = fn(*a)
            return c + out.ravel()[0] * 1e-30, out.ravel()[0]
        _, outs = lax.scan(body, jnp.float32(0), None, length=iters)
        return outs[-1]
    float(loop(*args))
    t0 = time.perf_counter()
    float(loop(*args))
    return (time.perf_counter() - t0) / iters


def main():
    from silent_speech_tpu.models import bigru as model
    from silent_speech_tpu.models.variants import (
        gru_word_classifier_forward,
        init_gru_word_classifier,
        init_unigru_classifier,
    )
    from silent_speech_tpu.infer.streaming import CarryStreamingGRU
    from silent_speech_tpu.ops.nn import dense

    rng = np.random.default_rng(0)
    results = {}

    # 1. clip predict (official model, T=90 bucket)
    mcfg = model.BiGRUConfig(x_dim=180, num_classes=10, use_roi=True)
    params = model.init_params(jax.random.PRNGKey(0), mcfg)
    X = jnp.asarray(rng.standard_normal((1, 90, 180)).astype(np.float32))
    L = jnp.asarray(np.asarray([60], np.int32))
    R = jnp.asarray(rng.integers(0, 256, (1, 90, 48, 96), dtype=np.uint8))

    fwd = jax.jit(lambda p, X, L, R: model.live_forward(p, mcfg, X, L, R))
    np.asarray(fwd(params, X, L, R))
    ts = []
    for _ in range(30):
        t0 = time.perf_counter()
        np.asarray(fwd(params, X, L, R))
        ts.append(time.perf_counter() - t0)
    results["clip_predict_ms"] = {
        "p50": 1e3 * _p(ts, 0.5), "p95": 1e3 * _p(ts, 0.95),
        "amortized": 1e3 * _amortized(
            lambda p, X, L, R: fwd(p, X, L, R), (params, X, L, R)),
    }

    # 2. sliding-window step (83-D family, max_t=90)
    wparams = init_gru_word_classifier(jax.random.PRNGKey(1), 83, 20)
    Xw = jnp.asarray(rng.standard_normal((1, 90, 83)).astype(np.float32))
    wfwd = jax.jit(lambda p, X: gru_word_classifier_forward(p, X))
    np.asarray(wfwd(wparams, Xw))
    ts = []
    for _ in range(30):
        t0 = time.perf_counter()
        np.asarray(wfwd(wparams, Xw))
        ts.append(time.perf_counter() - t0)
    results["window_step_ms"] = {
        "p50": 1e3 * _p(ts, 0.5), "p95": 1e3 * _p(ts, 0.95),
        "amortized": 1e3 * _amortized(lambda p, X: wfwd(p, X), (wparams, Xw)),
    }

    # 3. per-frame carry streaming (uni-GRU)
    uparams = init_unigru_classifier(jax.random.PRNGKey(2), 180, 10)
    eng = CarryStreamingGRU(uparams["gru"],
                            head=lambda h: dense(h, uparams["head"]))
    frame = rng.standard_normal(180).astype(np.float32)
    eng.push(frame)
    ts = []
    for _ in range(60):
        t0 = time.perf_counter()
        eng.push(frame)
        ts.append(time.perf_counter() - t0)
    results["carry_frame_ms"] = {
        "p50": 1e3 * _p(ts, 0.5), "p95": 1e3 * _p(ts, 0.95)}

    print(json.dumps(results, default=lambda o: round(float(o), 3)))


if __name__ == "__main__":
    main()
