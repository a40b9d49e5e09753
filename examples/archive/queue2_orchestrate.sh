#!/bin/bash
# Wait for queue v1 to exit, measure the MXU vs ys k=5 paths, pick flags,
# then run queue v2.  Launch: nohup bash examples/queue2_orchestrate.sh &
set -u
cd /root/repo
Q1_PID=$(cat /tmp/queue.pid 2>/dev/null || echo "")
if [ -n "$Q1_PID" ]; then
  while kill -0 "$Q1_PID" 2>/dev/null; do sleep 60; done
fi
echo "[$(date +%H:%M:%S)] queue v1 exited; measuring MXU kernels" >> runs/round3/queue2.log

python examples/bench_mxu.py fwd_mxu grad_mxu grad_ys \
  > runs/round3/bench_mxu.log 2>&1

MXU_MS=$(grep -o '"piece": "grad_mxu", "ms_per_iter": [0-9.]*' runs/round3/bench_mxu.log | grep -o '[0-9.]*$' || echo "")
YS_MS=$(grep -o '"piece": "grad_ys", "ms_per_iter": [0-9.]*' runs/round3/bench_mxu.log | grep -o '[0-9.]*$' || echo "")
echo "[$(date +%H:%M:%S)] grad_mxu=${MXU_MS:-FAIL} ms, grad_ys=${YS_MS:-FAIL} ms" >> runs/round3/queue2.log

export PERCNN_DISABLE_MXU=0
if [ -z "$MXU_MS" ]; then
  export PERCNN_DISABLE_MXU=1
elif [ -n "$YS_MS" ]; then
  SLOWER=$(python -c "print(1 if float('$MXU_MS') > float('$YS_MS') else 0)")
  [ "$SLOWER" = "1" ] && export PERCNN_DISABLE_MXU=1
fi
echo "[$(date +%H:%M:%S)] PERCNN_DISABLE_MXU=$PERCNN_DISABLE_MXU; starting queue v2" >> runs/round3/queue2.log

python examples/queue2_round3.py >> runs/round3/queue2.log 2>&1
echo "[$(date +%H:%M:%S)] queue v2 done" >> runs/round3/queue2.log
