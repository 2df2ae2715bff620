#!/bin/bash
# Round-5 chip driver v2 (replaces the fully-serial run_chipqueue_r5_all.sh
# mid-flight): r5a runs to completion, then gl18 launches; as soon as
# gl18's TRAINING finishes (save/guard_loop18/DONE — its remaining work
# is host-CPU evals), the TPU is free and iqns2_rescreen launches
# concurrently. One TPU process at a time is preserved: r5a, gl18
# training, and iqns2r training never overlap.
cd /root/repo || exit 1
echo $$ > /tmp/chipqueue_r5_driver.pid
echo "=== R5 DRIVER v2 start $(date)"

# Phase 1: wait for the already-running r5a script to exit.
R5A_PID=$(cat /tmp/chipqueue_r5a.pid 2>/dev/null)
if [ -n "$R5A_PID" ]; then
  while kill -0 "$R5A_PID" 2>/dev/null; do sleep 60; done
fi
echo "=== r5a finished $(date)"

# Phase 2: gl18 (trains on TPU, then long host-CPU eval matrix).
nohup bash scripts/run_guard_loop18.sh > logs/gl18_driver.log 2>&1 &
GL18_PID=$!
echo "=== gl18 launched pid $GL18_PID $(date)"

# Phase 3: once gl18 training is done (DONE marker) the TPU is idle —
# start iqns2r then. Hard fallback: if gl18 hasn't finished training in
# 4 h something is wrong; launch iqns2r anyway (and investigate).
WAITED=0
while [ ! -f save/guard_loop18/DONE ] && kill -0 "$GL18_PID" 2>/dev/null \
      && [ "$WAITED" -lt 14400 ]; do
  sleep 60; WAITED=$((WAITED + 60))
done
echo "=== gl18 training phase over (waited ${WAITED}s) $(date)"
nohup bash scripts/run_iqns2_rescreen.sh > logs/iqns2r_driver.log 2>&1 &
IQN_PID=$!
echo "=== iqns2r launched pid $IQN_PID $(date)"

wait "$GL18_PID" 2>/dev/null; echo "=== gl18 script exited $(date)"
wait "$IQN_PID" 2>/dev/null; echo "=== iqns2r script exited $(date)"
echo "=== R5 DRIVER v2 DONE $(date)"
