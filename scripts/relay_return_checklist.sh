#!/bin/bash
# Round-4 relay-return measurement session (VERDICT r3 item 1).
#
# Run this the moment `timeout 90 python -c "import jax; print(jax.devices())"`
# succeeds again. Runs every on-chip check ONE AT A TIME (the relay
# serializes compiles; concurrency turns 4-min compiles into 40-min hangs),
# each with a bounded timeout, logging to build/relay_return/.
#
#   bash scripts/relay_return_checklist.sh
#
# Afterwards: refresh BASELINE.md (dated rows), docs/STREAMING_PERF.md, and
# decide the fused-CNN default from bench_fused_cnn.log (ship roi_impl=fused
# in bench.py + Predictor only if it beats grouped by >=1.2x e2e).
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
OUT=build/relay_return
mkdir -p "$OUT"

run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name ($(date -u +%H:%M:%S)) ==="
  timeout "$tmo" "$@" >"$OUT/$name.log" 2>&1
  rc=$?
  tail -5 "$OUT/$name.log"
  echo "--- $name rc=$rc"
}

# sanity probe first: do not start a 30-min session against a wedged relay
if ! timeout 90 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
  echo "relay still wedged — aborting"; exit 1
fi

run bench            1800 python bench.py
run graft_entry      1800 python __graft_entry__.py
run tpu_parity_check 2400 python scripts/tpu_parity_check.py
run bench_fused_cnn  2400 python scripts/bench_fused_cnn.py
run bench_streaming  1800 python scripts/bench_streaming.py
echo "ALL DONE — logs in $OUT/"
