#!/bin/bash
# Chip queue 4c — COMMIT phase of the screen-then-commit seed pipeline.
#
# Usage: run_chipqueue_r4c_continue.sh <seeds>   e.g. ... 11,13
#
# Continues ONLY the screen-positive seeds of the r4c screen stack
# (save/rainbow/ms_screen, trained to 525k by run_chipqueue_r4c.sh) to
# the full 2.1M budget. Works because the vmapped multi-seed trainer
# saves solo-format per-seed checkpoints (sim/train_multiseed.py
# save()), so `-seeds <subset> -load true` resumes exactly those seeds'
# TrainStates (replay refills on-policy, same as any resume). The
# screen verdict comes from the operator reading the host sweeps (the
# canonical protocol; scripts/early_screen.py rule: any <=500k snapshot
# with 20-ep delay < 30 => continue).
cd /root/repo
SEEDS=$1
[ -n "$SEEDS" ] || { echo "usage: $0 <seeds e.g. 11,13>" >&2; exit 2; }
echo $$ > /tmp/chipqueue_r4c_cont.pid
export PYTHONPATH=/root/repo:/root/.axon_site
export MDRLRMC_SNAPSHOT_EVERY=125000

D=rainbow/ms_screen
if [ -f "save/$D/DONE" ]; then
  echo "$D continuation already done"
else
  echo "=== $D continue seeds $SEEDS start $(date) ==="
  python scripts/train_watchdog.py \
    --pidfile /tmp/train_ms_screen.pid \
    --log "logs/$D/train_continue.log" \
    -- train.py -backend device -n_env 256 -replay_ratio 1 -n_step 3 \
       -max_total_steps 2100000 -load true \
       -algo NoisyQrDuelingDQNAgent -lr 5e-5 -seeds "$SEEDS" \
       -obs_dtype bfloat16 \
       -save_dir "save/$D/" -log_dir "logs/$D/" \
    && touch "save/$D/DONE" \
    && for s in ${SEEDS//,/ }; do touch "save/$D/s$s/DONE"; done
  echo "=== $D continue end $(date) ==="
fi
echo "CHIPQUEUE R4C CONTINUE DONE $(date)"
