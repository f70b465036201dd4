"""Metrics, logging, and profiling hooks.

The reference's only observability is print lines and cv2 overlays
(SURVEY.md section 5). Here the console contract is kept by the loops, and
this module adds the structured layer the reference lacks: JSONL metric
streams, stage timers for the capture->device latency budget, and
`jax.profiler` trace capture around jitted steps.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from collections import defaultdict
from typing import Optional

import jax


class MetricsLogger:
    """Append-only JSONL metrics writer with wall-clock stamping."""

    def __init__(self, path: Optional[str] = None):
        self.path = path
        self._f = open(path, "a") if path else None
        self.t0 = time.time()

    def log(self, step: Optional[int] = None, **metrics):
        rec = {"t": round(time.time() - self.t0, 4)}
        if step is not None:
            rec["step"] = step
        for k, v in metrics.items():
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                rec[k] = v
        if self._f:
            # default=str: a non-floatable value (ndarray, numpy scalar in
            # 'step', ...) must degrade to its repr, not crash the caller's
            # training loop with a JSON TypeError
            self._f.write(json.dumps(rec, default=str) + "\n")
            self._f.flush()
        return rec

    def close(self):
        if self._f:
            self._f.close()
            self._f = None


class StageTimer:
    """Accumulating per-stage host timers (capture / landmark / H2D / step).

    with timer.stage("landmark"): ...   then timer.summary() -> p50/mean.
    """

    def __init__(self):
        self.samples = defaultdict(list)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.samples[name].append(time.perf_counter() - t0)

    def summary(self) -> dict:
        out = {}
        for name, xs in self.samples.items():
            xs_sorted = sorted(xs)
            n = len(xs_sorted)
            out[name] = {
                "n": n,
                "mean_ms": 1e3 * sum(xs_sorted) / n,
                "p50_ms": 1e3 * xs_sorted[n // 2],
                "p95_ms": 1e3 * xs_sorted[min(n - 1, int(0.95 * n))],
            }
        return out


@contextlib.contextmanager
def profiler_trace(log_dir: Optional[str]):
    """jax.profiler trace context; no-op when log_dir is None."""
    if not log_dir:
        yield
        return
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region visible in profiler traces (TraceAnnotation)."""
    with jax.profiler.TraceAnnotation(name):
        yield
