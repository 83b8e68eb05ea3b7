#!/bin/bash
# Round-5 battery, part 6: settle d_seq with the interleaved same-process
# A/B (the per-step runs in battery5 disagreed — perstep_dseq showed
# d 0.497 vs 0.530 but an inflated g 0.407 that d_seq cannot touch, a
# shared-chip-noise signature), and re-measure the FID reals leg with u8
# host batches (the fp32 leg's 1.17 img/s was pure tunnel upload).
set -u
cd "$(dirname "$0")/.."
L=docs/r5_logs
mkdir -p "$L"
S="$L/SUMMARY.txt"

run() {
  local name="$1"; shift
  local to="$1"; shift
  echo "=== $name: $* [$(date -u +%H:%M:%S)] ===" | tee -a "$S"
  timeout "$to" "$@" > "$L/${name}.log" 2>&1
  local rc=$?
  tail -8 "$L/${name}.log" | tee -a "$S"
  echo "(rc=$rc)" | tee -a "$S"
}

# 14. interleaved d_step A/B: base (fused two-pass) vs d_seq
run ab_dstep 3600 python tools/ab_dstep.py

# 15. FID reals leg, u8 host batches
run fid_reals_u8 1800 python tools/fid_dryrun.py --reals-only --n-real 1024

echo "battery6 done [$(date -u +%H:%M:%S)]" | tee -a "$S"
