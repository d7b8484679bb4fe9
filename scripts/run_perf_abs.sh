#!/bin/bash
# Round-3 perf A/B matrix. Run when the TPU is reachable:
#   bash scripts/run_perf_abs.sh /tmp/perf_ab.log
# Serializes every experiment (1 CPU core + 1 chip); each bench.py run
# prints one JSON line which we label and append. Compile cache makes
# the baseline run cheap if it was ever compiled before.
set -u
OUT="${1:-/tmp/perf_ab.log}"
cd /root/repo

run() {  # run <label> <env...> -- <cmd...>; returns the command's status
  local label="$1"; shift
  echo "=== $label $(date -u +%H:%M:%S) ===" | tee -a "$OUT"
  "$@" 2>>"$OUT.err" | tail -2 | sed "s/^/[$label] /" | tee -a "$OUT"
  local st=${PIPESTATUS[0]}
  [ "$st" -ne 0 ] && echo "[$label] FAILED exit $st" | tee -a "$OUT"
  return "$st"
}

# MATRIX RESULT (2026-08-18, v5e): base 154.53 imgs/s (FF 189.6 ms);
# flat_opt 154.28 — NEUTRAL (gate kept, harmless); pallas_fir — LOSS at
# the microbench level (68 vs 264 GB/s; kernel parked in ops/attic/
# fir.py, dispatch removed).  Kept runnable for future levers: add a
# `run <label> env VAR=1 timeout 5400 python bench.py` line per lever.

# Step-level A/Bs.  Each variant is a distinct HLO program: a cold
# run is ~15 min of remote compile PER step variant (FF/TF/TT), so give
# each bench up to 90 min; cache hits finish in ~2 min.
run base           timeout 5400 python bench.py
run flat_opt       env GANTRACK_FLAT_OPT=1 timeout 5400 python bench.py
# Round-5 levers: remat in the double-backward phases (Greg/Dreg deltas).
run r1_remat       env GANTRACK_R1_REMAT=1 timeout 5400 python bench.py
run r1_remat_dots  env GANTRACK_R1_REMAT=dots timeout 5400 python bench.py
run pl_remat       env GANTRACK_PL_REMAT=1 timeout 5400 python bench.py
run both_dots      env GANTRACK_R1_REMAT=dots GANTRACK_PL_REMAT=dots timeout 5400 python bench.py

echo "=== done $(date -u +%H:%M:%S) ===" | tee -a "$OUT"
