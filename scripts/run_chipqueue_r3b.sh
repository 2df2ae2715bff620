#!/bin/bash
# Late round-3 chip queue. Waits for the IQN retrain driver
# (/tmp/iqn2_driver.pid), then:
#   1. NoisyQr 6.3M — the best 2.1M distributional config
#      (448,182/31.84, BENCHMARKS.md) at the full flagship budget: can a
#      distributional head beat the scalar flagship's 30.4 ceiling?
#   2. PER fused-training throughput at B=1024 (BENCHMARKS has uniform
#      replay at 1024 but PER only at 256).
# Idempotent: `run` skips dirs with a DONE marker (reprovision recovery:
# just relaunch this script).
cd /root/repo
echo $$ > /tmp/chipqueue_r3b.pid
export PYTHONPATH=/root/repo:/root/.axon_site
export MDRLRMC_SNAPSHOT_EVERY=250000

# Gate on BOTH the launcher pidfile and the watchdog's trainer pidfile:
# after a reprovision the launcher pid is gone but a relaunched IQN
# retrain re-writes /tmp/train_iqn_lr5.pid — waiting on either prevents
# two TPU processes (CLAUDE.md invariant) regardless of which survived.
# If the IQN run is already DONE, don't wait at all.
while [ ! -f save/rainbow/iqn_lr5/DONE ] && {
    kill -0 "$(cat /tmp/iqn2_driver.pid 2>/dev/null)" 2>/dev/null ||
    kill -0 "$(cat /tmp/train_iqn_lr5.pid 2>/dev/null)" 2>/dev/null; }; do
  sleep 60
done

run() {
  d=$1; steps=$2; shift 2
  mkdir -p "save/$d" "logs/$d"
  if [ -f "save/$d/DONE" ]; then echo "$d already done"; return; fi
  echo "=== $d start $(date) ==="
  python scripts/train_watchdog.py \
    --pidfile "/tmp/train_$(basename "$d").pid" \
    --log "logs/$d/train.log" \
    -- train.py -backend device -n_env 256 -replay_ratio 1 -n_step 3 \
       -max_total_steps "$steps" -load false \
       -save_dir "save/$d/" -log_dir "logs/$d/" "$@" \
    && touch "save/$d/DONE"
  echo "=== $d end $(date) ==="
}

run rainbow/noisyqr63 6300000 -algo NoisyQrDuelingDQNAgent -lr 5e-5

echo "=== PER B=1024 throughput A/B $(date) ==="
python scripts/ab_per_tree.py 1024 2>&1 | tee logs/ab_per_b1024.log

echo "CHIPQUEUE R3B DONE $(date)"
