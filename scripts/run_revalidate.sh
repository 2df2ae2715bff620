#!/bin/bash
# Re-validation chip queue: retrain the headline-relevant runs that MAY
# have trained on the chunked-PER sampler's f32 edge bug (fixed in
# ops/sum_tree.py _chunked_sample — see test_partial_fill_never_samples_
# empty_slots). The reprovision wiped the train logs, so whether
# qr_lr5 / seed-3 / noisy63 ran before or after the chunked default
# flipped cannot be reconstructed; retraining them on the fixed sampler
# turns "probably unaffected" into checked evidence. Waits for the
# run_rainbow2.sh driver (pidfile) so only one TPU process exists.
# Companion CPU-side eval: scripts/eval_revalidate.sh.
cd /root/repo
echo $$ > /tmp/revalidate_driver.pid
export PYTHONPATH=/root/repo:/root/.axon_site
export MDRLRMC_SNAPSHOT_EVERY=250000

while kill -0 "$(cat /tmp/rainbow2_driver.pid 2>/dev/null)" 2>/dev/null; do
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
       -load false -save_dir "save/$d/" -log_dir "logs/$d/" "$@" \
    && touch "save/$d/DONE"
  echo "=== $d end $(date) ==="
}

run reval/qr_lr5  -algo QrDuelingDQNAgent -lr 5e-5 -max_total_steps 2100000
run reval/seed3   -algo PerDuelingDoubleDQNAgent -seed 3 -max_total_steps 6300000
run reval/noisy63 -algo NoisyPerDuelingDQNAgent -max_total_steps 6300000
echo "REVALIDATE RUNS DONE $(date)"
