#!/bin/bash
# Recover the 9th screen-v2 data point (BENCHMARKS "Screen v2"):
# NoisyIqn seed 2's <=500k screen snapshot was lost to a round-4
# reprovision, leaving the retro table at 8/9. Retrain seed 2 fresh to
# 525k (solo, current code — NOT bit-identical to the round-3 run: the
# round-5 MXU prefix-sum sampler changes PER draws at the ulp level, so
# this is an out-of-time replication, labeled IqnS2R), re-screen it,
# and if v1-positive run the v2 held-out window.
cd /root/repo || exit 1
echo $$ > /tmp/iqns2_rescreen.pid
export PYTHONPATH=/root/repo:/root/.axon_site
export MDRLRMC_SNAPSHOT_EVERY=125000

D=rainbow/iqns2_rescreen
mkdir -p "save/$D" "logs/$D"

if [ ! -f "save/$D/DONE" ]; then
  echo "=== iqns2 rescreen train start $(date)"
  python scripts/train_watchdog.py \
    --pidfile /tmp/train_iqns2r.pid --log "logs/$D/train.log" \
    -- train.py -backend device -n_env 256 -replay_ratio 1 -n_step 3 \
       -max_total_steps 525000 -load false \
       -algo NoisyIqnDuelingDQNAgent -lr 5e-5 -seed 2 \
       -save_dir "save/$D/" -log_dir "logs/$D/" \
    && touch "save/$D/DONE"
  echo "=== iqns2 rescreen train end $(date)"
fi
[ -f "save/$D/DONE" ] || { echo "training did not finish"; exit 1; }

SWEEP=logs/$D/sweep.csv
if [ ! -f "$SWEEP" ]; then
  JAX_PLATFORMS='' PYTHONPATH='' python scripts/eval_snapshots.py "save/$D" \
    -n 20 --workdir /tmp/iqns2r_sweep > "logs/$D/sweep.log" 2>&1 \
    && cp /tmp/iqns2r_sweep/summary.csv "$SWEEP"
fi
[ -f "$SWEEP" ] || { echo "sweep FAILED"; exit 1; }
read -r MIND SNAP <<< "$(python - "$SWEEP" <<'PY'
import csv, sys
rows = [r for r in csv.DictReader(open(sys.argv[1]))
        if float(r["steps"]) <= 500_000]
best = min(rows, key=lambda r: float(r["delay"]))
print(f"{float(best['delay']):.2f} {best['pack']}")
PY
)"
echo "IqnS2R screen: sweep-min $MIND @ $SNAP" | tee logs/$D/screen.txt
if python -c "import sys; sys.exit(0 if float('$MIND') < 30.0 else 1)"; then
  bash scripts/screen_holdout.sh "save/$D/$SNAP" "IqnS2R" \
    | tee -a logs/$D/screen.txt
else
  echo "IqnS2R v1-NEGATIVE (round-3 original was positive: 29.52 @500k)" \
    | tee -a logs/$D/screen.txt
fi
echo "IQNS2 RESCREEN DONE $(date)"
