#!/bin/bash
# Round-5 chip driver v3: keeps the TPU saturated across the three
# queued experiments by keying each launch off the *TPU phase* of the
# previous one, not its full script (host-CPU eval tails overlap the
# next training):
#   r5a continuation TPU-done (CONTINUE_DONE) -> launch gl18
#   gl18 training TPU-done (DONE)             -> launch iqns2r
# One TPU process at a time is preserved: each marker appears only
# after the previous trainer process has exited. 4-h fallbacks so a
# crashed phase can't deadlock the queue (the TPU is free then anyway).
cd /root/repo || exit 1
echo $$ > /tmp/chipqueue_r5_driver.pid
echo "=== R5 DRIVER v3 start $(date)"

wait_marker () {  # wait_marker <file> <timeout_s>
  local waited=0
  while [ ! -f "$1" ] && [ "$waited" -lt "$2" ]; do
    sleep 60; waited=$((waited + 60))
  done
  echo "=== marker $1 (waited ${waited}s) $(date)"
}

wait_marker save/rainbow/r5a_screen/CONTINUE_DONE 14400
nohup bash scripts/run_guard_loop18.sh > logs/gl18_driver.log 2>&1 &
GL18_PID=$!
echo "=== gl18 launched pid $GL18_PID $(date)"

wait_marker save/guard_loop18/DONE 14400
nohup bash scripts/run_iqns2_rescreen.sh > logs/iqns2r_driver.log 2>&1 &
IQN_PID=$!
echo "=== iqns2r launched pid $IQN_PID $(date)"

wait "$GL18_PID" 2>/dev/null; echo "=== gl18 script exited $(date)"
wait "$IQN_PID" 2>/dev/null; echo "=== iqns2r script exited $(date)"
echo "=== R5 DRIVER v3 DONE $(date)"
