#!/bin/bash
# Round-4 CPU chain, take 2 (the first died in a VM reset after pytest):
# finish the reference-scale multi-chip training validations.  Variants
# now resume mid-run from their checkpoint, and a sidecar loop
# force-commits the run dirs every 15 min so checkpoints survive resets.
# Launch: nohup bash examples/queue6_cpu_chain.sh &
set -u
cd /root/repo
LOG=runs/round4/cpu_chain2.log
mkdir -p runs/round4
export PYTHONPATH=/root/repo

DIRS="runs/round3/multichip_midscale.jsonl runs/round3/midscale_halo_4x2 \
  runs/round3/midscale_gspmd_4x2 runs/round4/multichip_midscale3d.jsonl \
  runs/round4/midscale3d_single runs/round4/midscale3d_halo_2x2x2"

(
  while true; do
    sleep 900
    git add -f $DIRS "$LOG" 2>/dev/null
    git diff --cached --quiet || git commit -q -m "midscale validation checkpoints (periodic)"
  done
) &
SIDE=$!
trap 'kill $SIDE 2>/dev/null' EXIT

echo "[$(date +%H:%M:%S)] midscale 2D (resume)" >> "$LOG"
nice -n 19 python examples/multichip_midscale.py >> "$LOG" 2>&1
echo "[$(date +%H:%M:%S)] midscale 2D rc=$?" >> "$LOG"
git add -f $DIRS "$LOG" 2>/dev/null
git commit -q -m "multichip validation artifacts: 2D reference-grid halo+gspmd training vs single-device control" || true

echo "[$(date +%H:%M:%S)] midscale 3D" >> "$LOG"
nice -n 19 python examples/multichip_midscale3d.py >> "$LOG" 2>&1
echo "[$(date +%H:%M:%S)] midscale 3D rc=$?" >> "$LOG"
git add -f $DIRS "$LOG" 2>/dev/null
git commit -q -m "multichip validation artifacts: 3D 48^3 halo mesh training vs single-device control" || true
echo "[$(date +%H:%M:%S)] cpu chain done" >> "$LOG"
