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

# 1. Pallas FIR microbench (per-shape GB/s vs XLA).  First real-Mosaic
# run of ops/pallas/fir.py — if it fails to lower (lane-regroup reshapes
# are the risk), skip the two PALLAS_FIR step benches instead of burning
# hours of remote compile on a broken lever.
run fir_micro timeout 3000 python scripts/bench_pallas_fir.py 64
fir_ok=$?

# 2. Step-level A/Bs.  Each variant is a distinct HLO program: a cold
# run is ~15 min of remote compile PER step variant (FF/TF/TT), so give
# each bench up to 90 min; cache hits finish in ~2 min.
run base           timeout 5400 python bench.py
run flat_opt       env GANTRACK_FLAT_OPT=1 timeout 5400 python bench.py
if [ "$fir_ok" -eq 0 ]; then
  run pallas_fir   env GANTRACK_PALLAS_FIR=1 timeout 5400 python bench.py
  run both         env GANTRACK_FLAT_OPT=1 GANTRACK_PALLAS_FIR=1 timeout 5400 python bench.py
else
  echo "[pallas_fir] SKIPPED: fir_micro failed (exit $fir_ok)" | tee -a "$OUT"
fi

echo "=== done $(date -u +%H:%M:%S) ===" | tee -a "$OUT"
