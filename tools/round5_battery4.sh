#!/bin/bash
# Round-5 battery, part 4: d_step xplane attribution (the dominant cost,
# 0.530 s of the 0.792 amortized iter) + the fixed STREAMING FID dry-run
# (v1 accumulated ~126 GB of fakes on the host and died; see
# tools/fid_dryrun.py docstring). Logs persist to docs/r5_logs/.
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
  tail -6 "$L/${name}.log" | tee -a "$S"
  echo "(rc=$rc)" | tee -a "$S"
}

# 9. d_step device-op attribution (what to optimise next)
run trace_dstep 3600 python bench_train.py --trace d_step

# 10. FID protocol throughput dry-run, streaming rewrite (10k/10k)
run fid_dryrun2 5400 python tools/fid_dryrun.py --n 10000

echo "battery4 done [$(date -u +%H:%M:%S)]" | tee -a "$S"
