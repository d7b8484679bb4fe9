#!/usr/bin/env bash
# End-to-end smoke drive: dataset -> dry-run -> 1-kimg train (+fid1k)
# -> gen_images -> calc_metrics.  Prints VERIFY DRIVE PASSED on success.
set -e
cd "$(dirname "$0")/.."
rm -rf /tmp/vdata /tmp/vruns /tmp/vgen
python - <<'EOF'
import numpy as np, sys; sys.path.insert(0, ".")
from gantrack_tpu.data.preprocess.packaging import pack_shards
rng = np.random.default_rng(0)
xs, ys = np.meshgrid(np.arange(32), np.arange(32))
imgs = [np.clip(255*np.exp(-(((xs-a)**2+(ys-b)**2)/(2*(2+r/4)**2)))
        + rng.normal(0,8,(32,32)),0,255).astype(np.float32)[:,:,None]
        for a,b,r in rng.uniform(6,26,(128,3))]
pack_shards("/tmp/vdata", "train", imgs, [f"s{i}" for i in range(128)])
EOF
echo "=== dataset packed ==="
python -m gantrack_tpu.tools.train --outdir=/tmp/vruns --cfg=stylegan2 \
  --data=/tmp/vdata --batch=8 --gamma=0.4096 --cbase=256 --cmax=64 \
  --kimg=1 --tick=1 --snap=1 --metrics=none --modalities=CT \
  --dataset=vsmoke --split=train --metrics_cache=False --dry-run
echo "=== dry-run ok ==="
python -m gantrack_tpu.tools.train --outdir=/tmp/vruns --cfg=stylegan2 \
  --data=/tmp/vdata --batch=8 --gamma=0.4096 --cbase=256 --cmax=64 \
  --kimg=1 --tick=1 --snap=1 --metrics=fid1k --modalities=CT \
  --dataset=vsmoke --split=train --metrics_cache=False --seed=1
RUN=$(ls -d /tmp/vruns/*/ | tail -1)
echo "=== train ok: $RUN ==="
ls "$RUN"
python -m gantrack_tpu.tools.gen_images --network="$RUN" --seeds=0-3 \
  --outdir=/tmp/vgen --resolution=32 --channels=1 --cbase=256 --cmax=64
echo "=== gen ok ==="
python -m gantrack_tpu.tools.calc_metrics --network="$RUN" \
  --metrics=kid10k --data=/tmp/vdata --split=train --resolution=32 \
  --channels=1 --cbase=256 --cmax=64 --batch=64
echo "=== VERIFY DRIVE PASSED ==="
