#!/bin/bash
# Follow-up pass after queue v2: retry any tags without an ok result
# (queue2_round3.py skips tags already ok in queue_results.jsonl), then
# render the noise-matrix report and the full-matrix Stage-2 refinement.
# Launch: nohup bash examples/queue3_followup.sh &
set -u
cd /root/repo
LOG=runs/round3/queue2.log
Q2_PID=$(cat /tmp/queue2.pid 2>/dev/null || echo "")
if [ -n "$Q2_PID" ]; then
  while kill -0 "$Q2_PID" 2>/dev/null; do sleep 60; done
fi
echo "[$(date +%H:%M:%S)] queue v2 orchestrator exited; follow-up pass" >> "$LOG"

# The axon plugin must come from sitecustomize (PYTHONPATH), and the repo
# must be importable.  See memory: axon-pythonpath-gotcha.
export PYTHONPATH=/root/.axon_site:/root/repo

# If the previous queue process was killed, the TPU grant can stay wedged
# for ~25 min; wait until the backend comes up before starting runs.
for i in $(seq 1 40); do
  if timeout 120 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
    echo "[$(date +%H:%M:%S)] TPU backend up (probe $i)" >> "$LOG"
    break
  fi
  echo "[$(date +%H:%M:%S)] TPU probe $i failed; sleeping 90s" >> "$LOG"
  sleep 90
done

# grad_mxu measured 4.49 ms vs grad_ys 32.6 ms (runs/round3/bench_mxu.log):
# keep the MXU path on.
export PERCNN_DISABLE_MXU=0
python examples/queue2_round3.py >> "$LOG" 2>&1
echo "[$(date +%H:%M:%S)] follow-up queue done" >> "$LOG"

JAX_PLATFORMS=cpu python examples/stage2_fullmatrix.py \
  >> runs/round3/fullmatrix.log 2>&1
python examples/noise_matrix_report.py > runs/round3/noise_matrix.md 2>&1
echo "[$(date +%H:%M:%S)] follow-up reports done" >> "$LOG"
