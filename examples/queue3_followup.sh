#!/bin/bash
# Follow-up pass after queue v2: retry any tags without an ok result
# (queue2_round3.py skips completed tags), then render the noise-matrix
# report.  Launch: nohup bash examples/queue3_followup.sh &
set -u
cd /root/repo
Q2_PID=$(cat /tmp/queue2.pid 2>/dev/null || echo "")
if [ -n "$Q2_PID" ]; then
  while kill -0 "$Q2_PID" 2>/dev/null; do sleep 120; done
fi
echo "[$(date +%H:%M:%S)] queue v2 exited; retry pass" >> runs/round3/queue2.log

# Same MXU decision the v2 orchestrator made (grad_mxu 4.49 ms vs grad_ys
# 32.6 ms in runs/round3/bench_mxu.log): keep the MXU path on.
export PERCNN_DISABLE_MXU=0
python examples/queue2_round3.py >> runs/round3/queue2.log 2>&1

python examples/noise_matrix_report.py > runs/round3/noise_matrix.md 2>&1
echo "[$(date +%H:%M:%S)] follow-up pass done" >> runs/round3/queue2.log
