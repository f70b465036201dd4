"""Serving-forward profiling harness: where does the fused-path batch go?

Times the bench.py serving forward (live_forward, roi_impl='fused'/tiled,
matmul_precision='parity') at the headline batch, captures a jax.profiler
trace over the relay, and aggregates the 'XLA Ops' rows into a per-op
breakdown — the same methodology as scripts/profile_train.py /
docs/ROI_CNN_PERF.md, extended with a Pallas custom-call category so the
fused CNN kernel shows up as its own line.

Usage: python scripts/profile_serving.py [--trace DIR] [--batch N]
"""

from __future__ import annotations

import sys as _sys, pathlib as _pathlib  # _REPO_ROOT_BOOTSTRAP: run without PYTHONPATH
_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parent.parent))

import argparse
import glob
import gzip
import json
import os
import re
import time
from collections import defaultdict
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

T = 32
ITERS = 50

_CATEGORIES = [
    ("pallas custom-call", re.compile(r"custom-call|tpu_custom_call", re.I)),
    ("convolution", re.compile(r"convolution|conv_general|%conv", re.I)),
    ("reduce-window/pool", re.compile(r"reduce-window|reduce_window|select-and-scatter", re.I)),
    ("matmul/dot", re.compile(r"dot|einsum|matmul", re.I)),
    ("while/scan (GRU)", re.compile(r"while", re.I)),
    ("copy/transpose/layout", re.compile(r"copy|transpose|bitcast|reshape", re.I)),
    ("dynamic-slice/gather", re.compile(r"slice|gather|scatter|take", re.I)),
    ("fusion (elementwise)", re.compile(r"fusion", re.I)),
]


def categorize(name: str) -> str:
    for cat, pat in _CATEGORIES:
        if pat.search(name):
            return cat
    return "other"


def parse_trace(trace_dir: str):
    files = sorted(glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                             recursive=True), key=os.path.getmtime)
    if not files:
        print(f"no trace.json.gz found under {trace_dir}")
        return
    with gzip.open(files[-1]) as f:
        d = json.load(f)
    ev = d.get("traceEvents", [])
    op_tids = {(e["pid"], e["tid"]) for e in ev
               if e.get("ph") == "M" and e.get("name") == "thread_name"
               and e.get("args", {}).get("name") == "XLA Ops"}
    by_cat = defaultdict(float)
    by_name = defaultdict(float)
    total = 0.0
    for e in ev:
        if e.get("ph") != "X" or (e.get("pid"), e.get("tid")) not in op_tids:
            continue
        dur = e.get("dur", 0) / 1e3  # us -> ms
        name = e.get("name", "?")
        by_cat[categorize(name)] += dur
        by_name[name] += dur
        total += dur
    print(f"\n== XLA Ops breakdown ({files[-1]}, total {total:.2f} ms) ==")
    for cat, ms in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"  {cat:>28s}: {ms:9.2f} ms  {100*ms/max(total,1e-9):5.1f}%")
    print("\n== top 25 ops ==")
    for name, ms in sorted(by_name.items(), key=lambda kv: -kv[1])[:25]:
        print(f"  {ms:9.2f} ms  {name[:110]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", default="/tmp/serving_trace")
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=ITERS)
    args = ap.parse_args()
    B = args.batch

    from silent_speech_tpu.models import bigru as model
    from silent_speech_tpu.ops.pallas_cnn2 import pack_roi_cnn_fused

    mcfg = model.BiGRUConfig(x_dim=180, num_classes=10, use_roi=True)
    params = model.init_params(jax.random.PRNGKey(0), mcfg)
    roi_packed = pack_roi_cnn_fused(jax.tree.map(np.asarray,
                                                 params["roi_cnn"]))

    @partial(jax.jit, static_argnames=("iters",))
    def loop_fwd(params, X, lengths, roi, iters):
        def body(carry, _):
            Xc, Rc = carry
            logits = model.live_forward(params, mcfg, Xc, lengths, Rc,
                                        roi_impl="fused",
                                        roi_packed=roi_packed,
                                        roi_variant="tiled",
                                        matmul_precision="parity")
            eps = logits[0, 0] * 1e-30
            Xc = Xc + eps
            Rc = Rc + (eps > 1e30).astype(jnp.uint8)
            return (Xc, Rc), logits[0, 0]
        (Xf, _), outs = lax.scan(body, (X, roi), None, length=iters)
        return outs[-1] + Xf[0, 0, 0]

    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.standard_normal((B, T, 180)).astype(np.float32))
    lengths = jnp.asarray(np.full((B,), T, np.int32))
    roi = jnp.asarray(rng.integers(0, 256, (B, T, 48, 96), dtype=np.uint8))
    float(loop_fwd(params, X, lengths, roi, 2))
    float(loop_fwd(params, X, lengths, roi, args.iters))
    t0 = time.perf_counter()
    float(loop_fwd(params, X, lengths, roi, args.iters))
    dt = (time.perf_counter() - t0) / args.iters
    print(f"serving forward B={B} fused/tiled parity: {dt*1e3:.3f} ms/batch "
          f"({B/dt:.0f} clips/s)", flush=True)

    if args.trace:
        os.makedirs(args.trace, exist_ok=True)
        opts = jax.profiler.ProfileOptions()
        opts.host_tracer_level = 0
        opts.python_tracer_level = 0
        jax.profiler.start_trace(args.trace, profiler_options=opts)
        try:
            out = loop_fwd(params, X, lengths, roi, 3)
            np.asarray(out)
        finally:
            jax.profiler.stop_trace()
        parse_trace(args.trace)


if __name__ == "__main__":
    main()
