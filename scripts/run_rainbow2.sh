#!/bin/bash
# Follow-up chip queue after scripts/run_rainbow.sh: the IQN agent run,
# re-validation of the de-jittered bench numerator, and two extra
# NoisyNet seeds (the 2.1M budget-efficiency claim in BENCHMARKS.md
# rests on one training seed). Waits for the run_rainbow.sh driver
# (pidfile /tmp/rainbow_driver.pid) so only one TPU process exists.
cd /root/repo
echo $$ > /tmp/rainbow2_driver.pid
export PYTHONPATH=/root/repo:/root/.axon_site
export MDRLRMC_SNAPSHOT_EVERY=250000

# run_rainbow.sh writes /tmp/rainbow_driver.pid itself (start this script
# only after it, so a missing pidfile means the driver already exited).
while kill -0 "$(cat /tmp/rainbow_driver.pid 2>/dev/null)" 2>/dev/null; do
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

run rainbow/iqn_lr5 -algo IqnDuelingDQNAgent -lr 5e-5

echo "=== bench re-validation $(date) ==="
python bench.py | tee logs/bench_r3_revalidate.json

# save/noisy already holds the seed-1 2.1M run (results_DQNAgentNoisy.csv),
# so the extra robustness seeds are 2 and 3.
run rainbow/noisy_s2 -algo NoisyPerDuelingDQNAgent -seed 2
run rainbow/noisy_s3 -algo NoisyPerDuelingDQNAgent -seed 3
echo "RAINBOW2 RUNS DONE $(date)"
