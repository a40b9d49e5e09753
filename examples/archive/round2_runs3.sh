#!/bin/bash
# Follow-up queue: waits for round2_runs2.sh to finish, then reruns
# gs3d (seed 1 — seed-0's T=300 stage destabilized mid-run) and the LO
# Stage-2/3 with the fixed Pareto knee.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}

while ! grep -q 'QUEUE2 DONE' runs/round2/driver.log; do sleep 60; done

run() {
  name=$1; shift
  echo "=== $name start $(date -u +%H:%M:%S)" >> runs/round2/driver.log
  timeout 7200 "$@" > "runs/round2/$name.log" 2>&1
  echo "=== $name rc=$? $(date -u +%H:%M:%S)" >> runs/round2/driver.log
}

run lo_stage23_v2 python -m percnn_tpu pipeline lo_stage1 \
    --out runs/round2/lo_pipeline_v2 \
    --stage1-recon runs/round2/lo_pipeline/lo_stage1.stage1_recon.npz
run gs3d_s1 python -m percnn_tpu run gs3d_recon --seed 1 \
    --out runs/round2/gs3d_s1
echo "QUEUE3 DONE $(date -u +%H:%M:%S)" >> runs/round2/driver.log
