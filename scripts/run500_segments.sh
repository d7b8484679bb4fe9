#!/bin/bash
# Drive the 500-kimg flagship run in 40-kimg segments, resuming each
# from the previous segment's last checkpoint.  Works around the
# tunneled runtime's per-dispatch host-memory retention (~22 MB/s at
# this step rate), which balloons any single long-lived process
# (observed: 70 GB RES stall at ~kimg 140).  Each segment is a fresh
# process; the persistent compile cache makes restarts ~2 min.
# usage: bash scripts/run500_segments.sh <start_target> <end_target>
set -u
cd /root/repo
START=${1:-200}
END=${2:-500}
OUT=/tmp/run500
for TARGET in $(seq "$START" 40 "$END"); do
  LAST=$(ls -d $OUT/0*/ | sort | tail -1)
  echo "=== segment to kimg $TARGET (resume from $LAST) $(date -u +%H:%M:%S) ==="
  python -m gantrack_tpu.tools.train --outdir=$OUT --cfg=stylegan2 \
    --data=/tmp/claro_shaped --batch=32 --gamma=0.4096 --cbase=16384 \
    --cmax=512 --map-depth=2 --kimg="$TARGET" --tick=4 --snap=10 \
    --metrics=fid10k --seed=0 --resume="${LAST}checkpoints" \
    || { echo "segment to $TARGET FAILED (retrying once)";
         LAST=$(ls -d $OUT/0*/ | sort | tail -1);
         python -m gantrack_tpu.tools.train --outdir=$OUT --cfg=stylegan2 \
           --data=/tmp/claro_shaped --batch=32 --gamma=0.4096 --cbase=16384 \
           --cmax=512 --map-depth=2 --kimg="$TARGET" --tick=4 --snap=10 \
           --metrics=fid10k --seed=0 --resume="${LAST}checkpoints" || exit 1; }
done
echo "=== run500 segments complete $(date -u +%H:%M:%S) ==="
