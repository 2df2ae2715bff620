#!/bin/bash
# Chip queue stage 3c: NoisyIqn 2.1M (the full-Rainbow composition wired
# after IQN's 2.1M results landed at 32.90 — noisy exploration lifted QR
# from 33-34.5 to 31.84, test the same lift on the implicit head).
# Waits for the r3b driver (noisyqr63 + PER A/B) so only one TPU process
# exists; reprovision-safe via the watchdog trainer pidfile.
cd /root/repo
echo $$ > /tmp/chipqueue_r3c.pid
export PYTHONPATH=/root/repo:/root/.axon_site
export MDRLRMC_SNAPSHOT_EVERY=250000

while kill -0 "$(cat /tmp/chipqueue_r3b.pid 2>/dev/null)" 2>/dev/null ||
      kill -0 "$(cat /tmp/train_noisyqr63.pid 2>/dev/null)" 2>/dev/null; do
  sleep 60
done

d=rainbow/noisyiqn_lr5
mkdir -p "save/$d" "logs/$d"
if [ ! -f "save/$d/DONE" ]; then
  echo "=== $d start $(date) ==="
  python scripts/train_watchdog.py \
    --pidfile "/tmp/train_$(basename "$d").pid" \
    --log "logs/$d/train.log" \
    -- train.py -backend device -n_env 256 -replay_ratio 1 -n_step 3 \
       -max_total_steps 2100000 -load false \
       -save_dir "save/$d/" -log_dir "logs/$d/" \
       -algo NoisyIqnDuelingDQNAgent -lr 5e-5 \
    && touch "save/$d/DONE"
  echo "=== $d end $(date) ==="
fi
echo "CHIPQUEUE R3C DONE $(date)"
