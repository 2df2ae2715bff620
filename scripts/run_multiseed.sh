#!/bin/bash
# Multi-seed flagship runs (VERDICT r2 item 2): 3 seeds of the shipped
# recipe, serialized (one TPU process at a time), each under the
# tunnel-hang watchdog. ~95 min/seed on one v5e chip.
cd /root/repo
for s in 1 2 3; do
  mkdir -p save/seeds/s$s logs/seeds/s$s
  if [ -f save/seeds/s$s/DONE ]; then echo "seed $s already done"; continue; fi
  echo "=== seed $s start $(date) ==="
  python scripts/train_watchdog.py \
    --pidfile /tmp/train_seed$s.pid \
    --log logs/seeds/s$s/train.log \
    -- train.py -algo PerDuelingDoubleDQNAgent -backend device \
       -n_env 256 -replay_ratio 1 -n_step 3 -max_total_steps 6300000 \
       -seed $s -load false \
       -save_dir save/seeds/s$s/ -log_dir logs/seeds/s$s/ \
    && touch save/seeds/s$s/DONE
  echo "=== seed $s end $(date) ==="
done
echo "ALL SEEDS DONE $(date)"
