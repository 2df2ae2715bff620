#!/bin/bash
# Chip queue stage 3d: seed robustness for the distributional picks.
# NoisyQr 31.84, IQN 32.16 and (pending) NoisyIqn each rest on one
# training seed, while plain QR showed 32.2-34.5 across seeds — the
# claim "noisy exploration stabilizes QR's seed variance" needs a
# second/third seed to stand. Waits for the r3c driver (NoisyIqn 2.1M)
# so only one TPU process exists; reprovision-safe via DONE markers and
# the watchdog trainer pidfiles.
cd /root/repo
echo $$ > /tmp/chipqueue_r3d.pid
export PYTHONPATH=/root/repo:/root/.axon_site
export MDRLRMC_SNAPSHOT_EVERY=250000

while kill -0 "$(cat /tmp/chipqueue_r3c.pid 2>/dev/null)" 2>/dev/null ||
      kill -0 "$(cat /tmp/train_noisyiqn_lr5.pid 2>/dev/null)" 2>/dev/null; do
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

# Seed-1 runs live in save/rainbow/{noisyqr_lr5,iqn_lr5,noisyiqn_lr5}.
run rainbow/noisyqr_s2  -algo NoisyQrDuelingDQNAgent  -lr 5e-5 -seed 2
run rainbow/noisyqr_s3  -algo NoisyQrDuelingDQNAgent  -lr 5e-5 -seed 3
run rainbow/iqn_s2      -algo IqnDuelingDQNAgent      -lr 5e-5 -seed 2
run rainbow/noisyiqn_s2 -algo NoisyIqnDuelingDQNAgent -lr 5e-5 -seed 2
echo "CHIPQUEUE R3D DONE $(date)"
