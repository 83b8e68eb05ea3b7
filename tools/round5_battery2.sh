#!/bin/bash
# Round-5 battery, part 2: the dec-bf16 record candidate + FID dry-run +
# first recorded inversion numbers. Logs persist to docs/r5_logs/.
set -u
cd "$(dirname "$0")/.."
L=docs/r5_logs
mkdir -p "$L"
S="$L/SUMMARY.txt"

run() {
  local name="$1"; shift
  echo "=== $name: $* [$(date -u +%H:%M:%S)] ===" | tee -a "$S"
  timeout 5400 "$@" > "$L/${name}.log" 2>&1
  local rc=$?
  tail -4 "$L/${name}.log" | tee -a "$S"
  echo "(rc=$rc)" | tee -a "$S"
}

# 6. bf16-decoder record candidate (the measured g_step win: 229 vs 350 ms)
run bench_train_decbf16 python bench_train.py --dec-dtype bfloat16

# 7. FID protocol throughput dry-run (10k/10k; 50k/50k extrapolation)
run fid_dryrun python tools/fid_dryrun.py --n 10000

# 8. first recorded flagship inversion run (elapsed + PSNR/SSIM/LPIPS)
run inversion python tools/inversion_onchip.py

echo "battery2 done [$(date -u +%H:%M:%S)]" | tee -a "$S"
