"""bf16 serving at the headline bench shape (VERDICT r4 item 4).

Replicates bench.py's measurement exactly (chained-scan live forward,
fused/tiled3 CNN + pallas GRU, B sweep 256/512/1024 at T=32) and compares
compute_dtype/precision modes, so BASELINE.md can carry a dated bf16 row at
the same shape as the f32-parity headline. bf16 still holds the 0.15
probability-drift guardrail (tests/test_bf16_parity.py) and its own audit
row (fused/pallas/bf16 in tpu_parity_check.py) but is NOT the <=1e-3 logit
parity mode.

Usage: python scripts/bench_bf16.py
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

from silent_speech_tpu.models import bigru as model
from silent_speech_tpu.ops.pallas_cnn2 import pack_roi_cnn_fused

T = 32
ITERS = 50


def main():
    assert jax.default_backend() == "tpu", "run on the TPU backend"
    mcfg = model.BiGRUConfig(x_dim=180, num_classes=10, use_roi=True)
    params = model.init_params(jax.random.PRNGKey(0), mcfg)
    roi_packed = pack_roi_cnn_fused(jax.tree.map(np.asarray,
                                                 params["roi_cnn"]))

    def make_loop(cdt, prec):
        @partial(jax.jit, static_argnames=("iters",))
        def loop_fwd(params, X, lengths, roi, iters):
            def body(carry, _):
                Xc, Rc = carry
                logits = model.live_forward(params, mcfg, Xc, lengths, Rc,
                                            roi_impl="fused",
                                            roi_packed=roi_packed,
                                            roi_variant="tiled3",
                                            gru_impl="pallas",
                                            compute_dtype=cdt,
                                            matmul_precision=prec)
                eps = logits[0, 0] * 1e-30
                Xc = Xc + eps
                Rc = Rc + (eps > 1e30).astype(jnp.uint8)
                return (Xc, Rc), logits[0, 0]
            (Xf, _), outs = lax.scan(body, (X, roi), None, length=iters)
            return outs[-1] + Xf[0, 0, 0]
        return loop_fwd

    rng = np.random.default_rng(0)
    out = {}
    for tag, cdt, prec in (
        ("f32/parity", jnp.float32, "parity"),
        ("bf16/parity", jnp.bfloat16, "parity"),
        ("bf16/default", jnp.bfloat16, None),
    ):
        loop = make_loop(cdt, prec)
        best, best_B = 0.0, 0
        for B in (256, 512, 1024):
            X = jnp.asarray(rng.standard_normal((B, T, 180)).astype(np.float32))
            lengths = jnp.asarray(np.full((B,), T, np.int32))
            roi = jnp.asarray(rng.integers(0, 256, (B, T, 48, 96),
                                           dtype=np.uint8))
            float(loop(params, X, lengths, roi, 2))
            float(loop(params, X, lengths, roi, ITERS))
            t0 = time.perf_counter()
            float(loop(params, X, lengths, roi, ITERS))
            dt = (time.perf_counter() - t0) / ITERS
            cps = B / dt
            print(f"{tag:13s} B={B:5d}: {dt*1e3:7.3f} ms -> {cps:9.0f} "
                  f"clips/s", flush=True)
            if cps > best:
                best, best_B = cps, B
        out[tag] = {"clips_per_s": round(best, 1), "best_B": best_B}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
