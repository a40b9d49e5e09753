#!/bin/bash
# Revised round-2 queue (after the STRidge Gram speedup): remaining runs.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
mkdir -p runs/round2

run() {
  name=$1; shift
  echo "=== $name start $(date -u +%H:%M:%S)" >> runs/round2/driver.log
  timeout 7200 "$@" > "runs/round2/$name.log" 2>&1
  echo "=== $name rc=$? $(date -u +%H:%M:%S)" >> runs/round2/driver.log
}

run lo_stage23 python -m percnn_tpu pipeline lo_stage1 \
    --out runs/round2/lo_pipeline \
    --stage1-recon runs/round2/lo_pipeline/lo_stage1.stage1_recon.npz
run gs3d python -m percnn_tpu run gs3d_recon --out runs/round2/gs3d
run stage3_spurious python examples/stage3_spurious_rk4.py \
    runs/round2/stage3_spurious 2000
run gs2d_ensemble python -m percnn_tpu ensemble gs2d_recon --members 4 \
    --iters 12000 --out runs/round2/gs2d_ens
echo "QUEUE2 DONE $(date -u +%H:%M:%S)" >> runs/round2/driver.log
