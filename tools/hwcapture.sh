#!/bin/bash
# One-shot hardware capture: run the moment the TPU tunnel is alive.
# Ordered by value-per-minute so a short alive window still lands the
# most important artifacts. Each step is individually bounded.
# Usage: bash tools/hwcapture.sh [outdir]   (default: report/)
set -u
cd "$(dirname "$0")/.."
OUT="${1:-report}"
mkdir -p "$OUT"
STAMP=$(date -u +%Y%m%dT%H%M%SZ)

echo "== 0. probe =="
timeout 75 python -c "
import jax, numpy as np, jax.numpy as jnp
np.asarray(jnp.arange(64)+1); print('alive:', jax.devices())" || {
  echo "tunnel dead; aborting"; exit 7; }

echo "== 1. bench worker (headline number) =="
BENCH_TRIALS=3 timeout 700 python bench.py --worker 2>&1 \
  | tee "$OUT/bench_worker_$STAMP.log" | grep '"metric"' | tail -1

echo "== 2. microbench (device kernel breakdown) =="
timeout 600 python tools/microbench.py 2>&1 | tee "$OUT/microbench_$STAMP.log"

echo "== 3. hwconfigs (BASELINE config matrix) =="
timeout 900 python tools/hwconfigs.py --seconds 120 \
  --out "$OUT/hardware_configs.md" 2>&1 | tail -8

echo "== 4. profiler trace =="
timeout 400 python tools/profile.py --trace-dir /tmp/flacenc_trace --seconds 10 \
  && echo "trace at /tmp/flacenc_trace"

echo "== 5. full report (compression + speed + real-audio section) =="
timeout 900 python tools/reporter.py -o "$OUT/report.md" --seconds 20 2>&1 | tail -6

echo "== done; commit the artifacts =="
