#!/bin/bash
# Round-2 full-scale reruns (all under the corrected IC conventions):
#   1. Burgers Stage-1->2->3 pipeline      (reference: 10000+1000 iters)
#   2. lambda-omega Stage-1->2->3 pipeline (reference: 15000 iters, Pareto S2)
#   3. GS-3D reconstruction                (reference: 12000 iters + watchdog)
#   4. Stage-3 spurious-term shrink, RK4   (reference 10%-noise LO Stage-3)
#   5. GS-2D 4-member ensemble, fused BPTT (2x reference budget)
# Sequential: one TPU chip. Each step logs to runs/round2/<name>.log.
set -u
cd /root/repo
# keep /root/.axon_site on the path — it bootstraps the axon TPU plugin
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
mkdir -p runs/round2

run() {
  name=$1; shift
  echo "=== $name start $(date -u +%H:%M:%S)" >> runs/round2/driver.log
  timeout 7200 "$@" > "runs/round2/$name.log" 2>&1
  echo "=== $name rc=$? $(date -u +%H:%M:%S)" >> runs/round2/driver.log
}

run burgers_pipeline python -m percnn_tpu pipeline burgers_stage1 \
    --out runs/round2/burgers_pipeline
run lo_pipeline python -m percnn_tpu pipeline lo_stage1 \
    --out runs/round2/lo_pipeline
run gs3d python -m percnn_tpu run gs3d_recon --out runs/round2/gs3d
run stage3_spurious python examples/stage3_spurious_rk4.py \
    runs/round2/stage3_spurious 2000
run gs2d_ensemble python -m percnn_tpu ensemble gs2d_recon --members 4 \
    --iters 12000 --out runs/round2/gs2d_ens
echo "ALL DONE $(date -u +%H:%M:%S)" >> runs/round2/driver.log
