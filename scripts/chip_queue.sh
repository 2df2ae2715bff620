#!/bin/bash
# Chip-work queue runner: serialized real-TPU jobs behind the multiseed
# training driver (one TPU process at a time, CLAUDE.md). One job per
# line in logs/chipqueue/queue.txt; each is run with the TPU environment
# once the multiseed driver (pidfile /tmp/multiseed.pid) has exited, and
# recorded in done.txt. Lines appended while running are picked up, so
# new chip jobs can be queued without touching the runner. Stop with:
# kill $(cat /tmp/chipqueue.pid).
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
Q=logs/chipqueue/queue.txt D=logs/chipqueue/done.txt
mkdir -p logs/chipqueue
touch "$Q" "$D"
while :; do
  if kill -0 "$(cat /tmp/multiseed.pid 2>/dev/null)" 2>/dev/null; then
    sleep 60; continue
  fi
  n=$(wc -l < "$D"); total=$(wc -l < "$Q")
  if [ "$n" -ge "$total" ]; then sleep 60; continue; fi
  job=$(sed -n "$((n + 1))p" "$Q")
  echo "=== chipqueue job $((n + 1)) start $(date): $job" >> logs/chipqueue/run.log
  bash -c "$job" >> logs/chipqueue/run.log 2>&1
  echo "=== chipqueue job $((n + 1)) exit $? $(date)" >> logs/chipqueue/run.log
  echo "$job" >> "$D"
done
