#!/bin/bash
# Full-Rainbow training runs (round 3): noisy exploration composed over
# the distributional heads (agents/dqn.py NoisyQr/NoisyC51), plus a
# second seed of the best existing distributional config (QR lr 5e-5,
# BENCHMARKS.md 32.24 delay) for robustness. Serialized on the one chip,
# each under the tunnel-hang watchdog; snapshots every 250k env steps
# because the distributional heads peak early (best-at-1M in the r3
# sweep) and eval-based snapshot selection needs a dense grid.
# Companion CPU-side eval: scripts/eval_rainbow.sh.
cd /root/repo
# Write our own pidfile: run_rainbow2.sh serializes on it (one TPU
# process at a time), and relying on the launcher to write it is exactly
# what breaks after a VM reprovision wipes /tmp.
echo $$ > /tmp/rainbow_driver.pid
export PYTHONPATH=/root/repo:/root/.axon_site
export MDRLRMC_SNAPSHOT_EVERY=250000

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

run rainbow/noisyqr_lr5  -algo NoisyQrDuelingDQNAgent  -lr 5e-5
run rainbow/qr_lr5_s1    -algo QrDuelingDQNAgent       -lr 5e-5 -seed 1
run rainbow/noisyc51_lr5 -algo NoisyC51DuelingDQNAgent -lr 5e-5 \
                         -v_min -45 -v_max 60
echo "RAINBOW RUNS DONE $(date)"
