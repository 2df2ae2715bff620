#!/bin/bash
# Chip queue 4c — SCREEN phase of the screen-then-commit seed pipeline.
#
# The early-decidability rule (scripts/early_screen.py; 15/15 correct on
# 11 in-sample + 4 out-of-sample seeds) says a noisy-distributional
# seed's final tier is decidable from its <=500k snapshots: any sub-30
# 20-episode sweep delay by 500k => the seed reaches the ~29 mode at
# 2.1M; no sub-30 => it never does. Since the vmapped multi-seed trainer
# saves per-seed solo-format checkpoints (sim/train_multiseed.py
# save()), a stack can be trained to the 525k screen point (~20 min for
# K=4), screened, and only screen-positive seeds continued with
# `-seeds <positives> -load true` — ~4x fewer chip-minutes per
# discovered ~29 seed than round 3's serialized 2.1M-per-seed queues.
#
# This queue trains 4 fresh NoisyQr seeds (11-14) to 525k. Screening +
# the continuation decision are done by the post-r4b chain / operator:
#   host screen (canonical): scripts/eval_snapshots.py on each s<k>
#   continuation:            run_chipqueue_r4c_continue.sh (positives)
# Reprovision-safe: skips on DONE, resumes via the watchdog.
cd /root/repo
echo $$ > /tmp/chipqueue_r4c.pid
export PYTHONPATH=/root/repo:/root/.axon_site
export MDRLRMC_SNAPSHOT_EVERY=125000

D=rainbow/ms_screen
mkdir -p "save/$D" "logs/$D"
if [ -f "save/$D/SCREEN_DONE" ]; then
  echo "$D screen phase already done"
else
  echo "=== $D screen phase start $(date) ==="
  python scripts/train_watchdog.py \
    --pidfile /tmp/train_ms_screen.pid \
    --log "logs/$D/train.log" \
    -- train.py -backend device -n_env 256 -replay_ratio 1 -n_step 3 \
       -max_total_steps 525000 -load false \
       -algo NoisyQrDuelingDQNAgent -lr 5e-5 -seeds 11,12,13,14 \
       -obs_dtype bfloat16 \
       -save_dir "save/$D/" -log_dir "logs/$D/" \
    && touch "save/$D/SCREEN_DONE"
  echo "=== $D screen phase end $(date) ==="
fi

# Fast device-protocol sweeps of the screen snapshots (also more
# host-vs-device protocol-agreement data; the canonical screen verdict
# uses the HOST sweeps the eval watcher produces on CPU).
if [ -f "save/$D/SCREEN_DONE" ]; then
  for s in s11 s12 s13 s14; do
    echo "=== device screen sweep $s $(date)"
    timeout 1800 python scripts/eval_snapshots_device.py "save/$D/$s" \
      -n 50 --algo NoisyQrDuelingDQNAgent \
      --workdir "logs/$D/${s}_device" || true
  done
fi
echo "CHIPQUEUE R4C SCREEN DONE $(date)"
