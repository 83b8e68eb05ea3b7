#!/bin/bash
# Round-5 battery, part 5: d_step memory-pressure attack.
# The d_step trace (docs/r5_logs/trace_dstep.log) shows XLA compression-remat
# copies + layout copies dominating (copy-start 376 ms, copy 171 ms of a
# 528 ms step). d_seq halves the residual peak by running the separable
# fake/real decoder-D passes sequentially (exact numerics,
# tests/test_train.py::test_d_seq_matches_fused).
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

# 11. per-step attribution with d_seq (compare against
#     docs/r5_logs/bench_train_per_step.log: d 0.530 / r1 0.958 / g 0.225)
run perstep_dseq 3600 python bench_train.py --per-step --d-seq

# 12. Pallas fused SIREN in the G update (VERDICT r4 item 6): custom_vjp
#     backward == free remat; eikonal via standalone trunk vjp
run perstep_fusedg 3600 python bench_train.py --per-step --fused-g

# 13. if d_seq wins, this is the new record candidate (full amortized run,
#     best flags from 11/12 folded in by hand before launch)
run bench_train_dseq 3600 python bench_train.py --d-seq

echo "battery5 done [$(date -u +%H:%M:%S)]" | tee -a "$S"
