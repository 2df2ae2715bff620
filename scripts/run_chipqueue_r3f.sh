#!/bin/bash
# Chip queue stage 3f: widen the NoisyIqn seed distribution.
# NoisyIqn seed 2 is the repo-best agent (29.02 in-protocol, 29.87
# held-out, bounded tail) but the family has n=2 seeds (33.06 / 29.02),
# and both ~29 agents in the repo share train seed 2 — i.e., the same
# training demand stream. Three more seeds answer (a) the honest
# NoisyIqn seed-mean, (b) whether the ~29 permissive-adaptive mode
# requires that particular stream. Dense 125k snapshots as in r3e.
# Waits for the r3e driver; reprovision-safe.
cd /root/repo
echo $$ > /tmp/chipqueue_r3f.pid
export PYTHONPATH=/root/repo:/root/.axon_site
export MDRLRMC_SNAPSHOT_EVERY=125000

while kill -0 "$(cat /tmp/chipqueue_r3e.pid 2>/dev/null)" 2>/dev/null ||
      kill -0 "$(cat /tmp/train_noisyqr_s6.pid 2>/dev/null)" 2>/dev/null; do
  sleep 60
done

run() {
  d=$1; shift
  mkdir -p "save/$d" "logs/$d"
  if [ -f "save/$d/DONE" ]; then echo "$d already done"; return; fi
  echo "=== $d start $(date) ==="
  python scripts/train_watchdog.py \
    --pidfile "/tmp/train_$(basename "$d").pid" \
    --log "logs/$d/train.log" \
    -- train.py -backend device -n_env 256 -replay_ratio 1 -n_step 3 \
       -max_total_steps 2100000 -load false \
       -save_dir "save/$d/" -log_dir "logs/$d/" "$@" \
    && touch "save/$d/DONE"
  echo "=== $d end $(date) ==="
}

run rainbow/noisyiqn_s3 -algo NoisyIqnDuelingDQNAgent -lr 5e-5 -seed 3
run rainbow/noisyiqn_s4 -algo NoisyIqnDuelingDQNAgent -lr 5e-5 -seed 4
run rainbow/noisyiqn_s5 -algo NoisyIqnDuelingDQNAgent -lr 5e-5 -seed 5
echo "CHIPQUEUE R3F DONE $(date)"
