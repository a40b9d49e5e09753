#!/bin/bash
# Round-4 CPU-side chain (single-core VM; nice'd so the TPU queue's host
# process keeps priority): full test suite, then the reference-scale
# multi-chip training validations (2D resume: halo_4x2 + gspmd_4x2; 3D:
# single + halo_2x2x2), committing each result as it lands.
set -u
cd /root/repo
LOG=runs/round4/cpu_chain.log
mkdir -p runs/round4
export PYTHONPATH=/root/repo

echo "[$(date +%H:%M:%S)] pytest" >> "$LOG"
nice -n 19 python -m pytest tests/ -x -q >> "$LOG" 2>&1
echo "[$(date +%H:%M:%S)] pytest rc=$?" >> "$LOG"
git add -f "$LOG" 2>/dev/null && git commit -q -m "round-4 CPU chain: test-suite result" || true

echo "[$(date +%H:%M:%S)] midscale 2D (resume)" >> "$LOG"
nice -n 19 python examples/multichip_midscale.py >> "$LOG" 2>&1
echo "[$(date +%H:%M:%S)] midscale 2D rc=$?" >> "$LOG"
git add -f runs/round3/multichip_midscale.jsonl runs/round3/midscale_halo_4x2 \
  runs/round3/midscale_gspmd_4x2 "$LOG" 2>/dev/null
git commit -q -m "multichip validation artifacts: 2D reference-grid halo+gspmd training vs single-device control" || true

echo "[$(date +%H:%M:%S)] midscale 3D" >> "$LOG"
nice -n 19 python examples/multichip_midscale3d.py >> "$LOG" 2>&1
echo "[$(date +%H:%M:%S)] midscale 3D rc=$?" >> "$LOG"
git add -f runs/round4/multichip_midscale3d.jsonl runs/round4/midscale3d_single \
  runs/round4/midscale3d_halo_2x2x2 "$LOG" 2>/dev/null
git commit -q -m "multichip validation artifacts: 3D 48^3 halo mesh training vs single-device control" || true
echo "[$(date +%H:%M:%S)] cpu chain done" >> "$LOG"
