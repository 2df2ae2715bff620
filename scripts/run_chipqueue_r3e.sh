#!/bin/bash
# Chip queue stage 3e: widen the NoisyQr seed distribution.
# Seeds 1-3 landed 31.84 / 29.21 / 32.75 — seed 2 is the repo-best
# agent and the only decisive beat of the best static green, but n=3 is
# a thin basis for "NoisyQr band 29-33, ship seed 2". Three more seeds
# give n=6; the denser 125k snapshot grid probes how early the good
# band is reached (seed 2 was already at 29.79 sweep-delay by its first
# snapshot, 250k). Waits for the r3d driver; reprovision-safe.
cd /root/repo
echo $$ > /tmp/chipqueue_r3e.pid
export PYTHONPATH=/root/repo:/root/.axon_site
export MDRLRMC_SNAPSHOT_EVERY=125000

while kill -0 "$(cat /tmp/chipqueue_r3d.pid 2>/dev/null)" 2>/dev/null ||
      kill -0 "$(cat /tmp/train_noisyiqn_s2.pid 2>/dev/null)" 2>/dev/null; do
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

run rainbow/noisyqr_s4 -algo NoisyQrDuelingDQNAgent -lr 5e-5 -seed 4
run rainbow/noisyqr_s5 -algo NoisyQrDuelingDQNAgent -lr 5e-5 -seed 5
run rainbow/noisyqr_s6 -algo NoisyQrDuelingDQNAgent -lr 5e-5 -seed 6
echo "CHIPQUEUE R3E DONE $(date)"
