#!/bin/bash
# Round-4 on-chip battery: run the moment the axon tunnel returns.
# Serialized (one compile at a time on this 1-core host); each stage logs to
# /tmp/r4_<stage>.log and appends a one-line summary to /tmp/r4_summary.txt.
set -u
cd "$(dirname "$0")/.."
S=/tmp/r4_summary.txt
: > "$S"

run() {
  local name="$1"; shift
  echo "=== $name: $* ===" | tee -a "$S"
  timeout 3600 "$@" > "/tmp/r4_${name}.log" 2>&1
  local rc=$?
  tail -2 "/tmp/r4_${name}.log" | tee -a "$S"
  echo "(rc=$rc)" | tee -a "$S"
}

# 1. serving number of record + RGBx-fold driver-path validation
run bench python bench.py

# 2. queued serving A/Bs: drift control + fold_rgb + sin7 + the new bias fold
AB_VARIANTS=fused_bufs,fold_rgb,sin7,fold_bias run ab_serving python tools/ab_serving.py

# 3. blur->stride-2 conv composition in the real d_step (targets the 267 ms
#    image-D share)
run ab_blur python tools/ab_blur.py

# 4. decoder-dtype A/B in the real g_step (g_step = 0.318 s of the 0.854
#    record; bf16 decoder has never been A/B'd train-side)
run ab_gstep_dec python tools/ab_gstep_dec.py

# 5. train-step artifact with the OOM fallback live
run bench_train python bench_train.py

echo "battery done" | tee -a "$S"
