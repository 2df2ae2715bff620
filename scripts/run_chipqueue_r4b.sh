#!/bin/bash
# Chip queue 4b: 4 fresh NoisyIqn seeds (6-9) in ONE stacked multi-seed
# run (the NoisyIqn config table has 5 seeds vs NoisyQr's 6+4; this
# balances it AND tests the early-decidability rule on the implicit-
# quantile head — every ~29 NoisyIqn seed's best snapshot so far was at
# 375k-1M, so the 500k-screen hypothesis needs per-head evidence).
# bf16 replay obs storage per BENCHMARKS "Multi-seed training".
# Reprovision-safe: skips on DONE, resumes via the watchdog's -load true.
cd /root/repo
echo $$ > /tmp/chipqueue_r4b.pid
export PYTHONPATH=/root/repo:/root/.axon_site
export MDRLRMC_SNAPSHOT_EVERY=125000

D=rainbow/ms_probe_iqn
mkdir -p "save/$D" "logs/$D"
if [ -f "save/$D/DONE" ]; then
  echo "$D already done"
else
  echo "=== $D start $(date) ==="
  python scripts/train_watchdog.py \
    --pidfile /tmp/train_ms_probe_iqn.pid \
    --log "logs/$D/train.log" \
    -- train.py -backend device -n_env 256 -replay_ratio 1 -n_step 3 \
       -max_total_steps 2100000 -load false \
       -algo NoisyIqnDuelingDQNAgent -lr 5e-5 -seeds 6,7,8,9 \
       -obs_dtype bfloat16 \
       -save_dir "save/$D/" -log_dir "logs/$D/" \
    && touch "save/$D/DONE" save/$D/s6/DONE save/$D/s7/DONE \
             save/$D/s8/DONE save/$D/s9/DONE
  echo "=== $D end $(date) ==="
fi
echo "CHIPQUEUE R4B DONE $(date)"
