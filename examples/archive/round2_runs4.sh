#!/bin/bash
# Validate the newly-default fused_pg training paths at full scale.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
run() {
  name=$1; shift
  echo "=== $name start $(date -u +%H:%M:%S)" >> runs/round2/driver.log
  timeout 5400 "$@" > "runs/round2/$name.log" 2>&1
  echo "=== $name rc=$? $(date -u +%H:%M:%S)" >> runs/round2/driver.log
}
run gs3d_pg python -m percnn_tpu run gs3d_recon --seed 1 --out runs/round2/gs3d_pg
run gs2d_ens_pg python -m percnn_tpu ensemble gs2d_recon --members 4 \
    --iters 12000 --out runs/round2/gs2d_ens_pg
echo "QUEUE4 DONE $(date -u +%H:%M:%S)" >> runs/round2/driver.log
