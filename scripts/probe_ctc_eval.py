"""Decompose the batched CTC eval cost: transfer vs forward vs lattice.

The first bench_ctc.py eval rows were transfer-dominated (fresh numpy
arrays re-shipped through the axon relay every call); this probe times each
piece on pre-placed device arrays and the host->device copy separately, for
both knob sets, and sizes the auto word-chunk bound for score_batch.

Usage: python scripts/probe_ctc_eval.py
"""

from __future__ import annotations

import sys as _sys, pathlib as _pathlib  # _REPO_ROOT_BOOTSTRAP: run without PYTHONPATH
_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parent.parent))

import time

import numpy as np

import jax
import jax.numpy as jnp

from silent_speech_tpu.infer.ctc_decode import CTCDecoder, Dictionary
from silent_speech_tpu.models import ctc_model

B, T, D = 256, 80, 180


def tmin(fn, reps=5):
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    params = ctc_model.init_params(jax.random.PRNGKey(0), D)
    rng = np.random.default_rng(1)
    words = ["".join(chr(97 + c) for c in rng.integers(0, 26,
                                                       rng.integers(3, 9)))
             for _ in range(10)]
    X = rng.standard_normal((B, T, D)).astype(np.float32)
    R = rng.integers(0, 256, (B, T, 48, 96), dtype=np.uint8)
    L = rng.integers(T // 2, T + 1, B).astype(np.int32)

    # host->device transfer alone (materialize one element to wait it out)
    dt = tmin(lambda: np.asarray(jax.device_put(R)[0, 0, 0, 0]))
    print(f"transfer R ({R.nbytes/1e6:.0f} MB u8): {dt*1e3:8.1f} ms")
    dt = tmin(lambda: np.asarray(jax.device_put(X)[0, 0, 0]))
    print(f"transfer X ({X.nbytes/1e6:.0f} MB f32): {dt*1e3:8.1f} ms")

    Xd, Rd, Ld = jnp.asarray(X), jnp.asarray(R), jnp.asarray(L)
    for tag, kw in (
        ("xla/scan", dict(roi_impl="xla", gru_impl="scan",
                          matmul_precision=None)),
        ("fused/pallas/parity", dict(roi_impl="fused", gru_impl="pallas",
                                     matmul_precision="parity")),
    ):
        dec = CTCDecoder(params, Dictionary.from_words(words), max_t=T, **kw)
        lp = dec._logprobs(dec.params, Xd, Rd, Ld)
        np.asarray(lp)
        dt_f = tmin(lambda: np.asarray(
            dec._logprobs(dec.params, Xd, Rd, Ld)[0, 0, 0]))
        ids = jnp.asarray(dec.dict.ids)
        lens = jnp.asarray(dec.dict.lens)
        Tj = jnp.asarray(L)
        np.asarray(dec._chunk_scores(lp, Tj, ids, lens))
        dt_l = tmin(lambda: np.asarray(
            dec._chunk_scores(lp, Tj, ids, lens)[0, 0]))
        dt_e = tmin(lambda: dec.score_batch(X, R, L))
        print(f"{tag:20s}: forward {dt_f*1e3:7.1f} ms | lattice(W=10) "
              f"{dt_l*1e3:7.1f} ms | score_batch(host np) {dt_e*1e3:7.1f} ms",
              flush=True)


if __name__ == "__main__":
    main()
