#!/bin/bash
# Round-5 on-chip battery. TRAIN STAGES FIRST (round-4 lesson: the train
# half was queued last and never ran). All logs persist to docs/r5_logs/
# (committed with the repo — never /tmp) so a half-run is always recorded.
set -u
cd "$(dirname "$0")/.."
L=docs/r5_logs
mkdir -p "$L"
S="$L/SUMMARY.txt"
: > "$S"

run() {
  local name="$1"; shift
  echo "=== $name: $* [$(date -u +%H:%M:%S)] ===" | tee -a "$S"
  timeout 5400 "$@" > "$L/${name}.log" 2>&1
  local rc=$?
  tail -4 "$L/${name}.log" | tee -a "$S"
  echo "(rc=$rc)" | tee -a "$S"
}

# 1. blur->stride-2 conv composition in the real d_step (validates or
#    reverts the FUSE_DOWN_CONV TPU default; now has an OOM remat fallback)
run ab_blur python tools/ab_blur.py

# 2. decoder-dtype A/B in the real g_step (bf16 decoder never A/B'd
#    train-side; g_step = 0.318 s of the 0.854 record)
run ab_gstep_dec python tools/ab_gstep_dec.py

# 3. train-step artifact of record (record config: bf16 D, no remat,
#    r1_chunk=2; OOM fallback live) -> BENCH_TRAIN_r05.json
run bench_train python bench_train.py
grep -h '"metric"' "$L/bench_train.log" | tail -1 > BENCH_TRAIN_r05.json \
  && echo "BENCH_TRAIN_r05.json written" | tee -a "$S"

# 4. serving number sanity (driver re-runs bench.py at round end)
run bench python bench.py

# 5. serving A/B: drift control + default + fp32/XLA-path refresh
AB_VARIANTS=fused_bufs,fold_rgb,xla_fp32 run ab_serving python tools/ab_serving.py

echo "battery done [$(date -u +%H:%M:%S)]" | tee -a "$S"
