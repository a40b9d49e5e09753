#!/bin/bash
# Round-4 final gate: after the CPU chain (midscale validations) drains,
# run the FULL test suite on the then-current tree (the 14:56 run predates
# the stability-selection + lr_recover commits) and commit the result.
# Launch: nohup bash examples/queue4_final_tests.sh & echo $! > /tmp/final_tests.pid
set -u
cd /root/repo
LOG=runs/round4/final_tests.log
mkdir -p runs/round4
export PYTHONPATH=/root/repo

PID=$(cat /tmp/cpu_chain.pid 2>/dev/null || echo "")
if [ -n "$PID" ]; then
  while kill -0 "$PID" 2>/dev/null; do sleep 120; done
fi
echo "[$(date +%H:%M:%S)] cpu chain drained; full pytest @ $(git rev-parse --short HEAD)" >> "$LOG"
nice -n 19 python -m pytest tests/ -q >> "$LOG" 2>&1
RC=$?
echo "[$(date +%H:%M:%S)] pytest rc=$RC" >> "$LOG"
git add -f "$LOG" 2>/dev/null && git commit -q -m "round-4 final gate: full test suite on the post-lr_recover tree" || true
