#!/bin/bash
# Chip queue 5c — third prospective screen round (NoisyQr seeds
# 23-26), same pipeline as r5a/r5b. Registered predictions, sharpened by
# the r5a outcome (BENCHMARKS "Screen v2 prospective validation"):
# (1) v1 keeps recall (no ~29 seed screened out); (2) the v3
# window-worst edge (<=45 s/veh at the screen snapshot) beats the v2
# cat-count tier at separating deploys-clean from
# touched-and-degenerate — v3-clean seeds deploy with 0 catastrophic
# episodes at n=50, v3-razor seeds don't deploy clean. The holdout
# window's mean/worst/cat line is printed per positive, so both
# hypotheses evaluate from the same artifacts.
# Reprovision-safe: DONE markers + watchdog resume + skip-on-CSV.
cd /root/repo || exit 1
echo $$ > /tmp/chipqueue_r5c.pid
export PYTHONPATH=/root/repo:/root/.axon_site
export MDRLRMC_SNAPSHOT_EVERY=125000

D=rainbow/r5c_screen
SEEDS="23,24,25,26"
ALGO=NoisyQrDuelingDQNAgent
mkdir -p "save/$D" "logs/$D"

if [ ! -f "save/$D/SCREEN_DONE" ]; then
  echo "=== r5c screen phase start $(date)"
  python scripts/train_watchdog.py \
    --pidfile /tmp/train_r5c.pid --log "logs/$D/train.log" \
    -- train.py -backend device -n_env 256 -replay_ratio 1 -n_step 3 \
       -max_total_steps 525000 -load false \
       -algo $ALGO -lr 5e-5 -seeds $SEEDS -obs_dtype bfloat16 \
       -save_dir "save/$D/" -log_dir "logs/$D/" \
    && touch "save/$D/SCREEN_DONE"
  echo "=== r5c screen phase end $(date)"
fi
[ -f "save/$D/SCREEN_DONE" ] || { echo "screen training did not finish"; exit 1; }

# Host screens (CPU) + v2 held-out windows for positives.
POSITIVES=""
for k in 23 24 25 26; do
  SD=save/$D/s$k
  SWEEP=logs/$D/sweep_s$k.csv
  if [ ! -f "$SWEEP" ]; then
    echo "=== host screen sweep s$k $(date)"
    JAX_PLATFORMS='' PYTHONPATH='' python scripts/eval_snapshots.py "$SD" \
      -n 20 --workdir /tmp/r5c_sweep_s$k > "logs/$D/sweep_s$k.log" 2>&1 \
      && cp /tmp/r5c_sweep_s$k/summary.csv "$SWEEP"
  fi
  [ -f "$SWEEP" ] || { echo "s$k sweep FAILED"; continue; }
  read -r MIND SNAP <<< "$(python - "$SWEEP" <<'PY'
import csv, sys
rows = [r for r in csv.DictReader(open(sys.argv[1]))
        if float(r["steps"]) <= 500_000]
best = min(rows, key=lambda r: float(r["delay"]))
print(f"{float(best['delay']):.2f} {best['pack']}")
PY
)"
  echo "s$k screen: sweep-min $MIND @ $SNAP"
  if python -c "import sys; sys.exit(0 if float('$MIND') < 30.0 else 1)"; then
    POSITIVES="$POSITIVES $k"
    if [ ! -f "evaluation/results_screen_holdout/results_DQNAgentScreenQrS$k.csv" ]; then
      echo "=== v2 held-out window s$k $(date)"
      bash scripts/screen_holdout.sh "$SD/$SNAP" "QrS$k" \
        | tee "logs/$D/holdout_s$k.txt"
    fi
  else
    echo "s$k NEGATIVE (no continuation)"
  fi
done
echo "v1 positives:$POSITIVES"
echo "$POSITIVES" > logs/$D/positives.txt

# Continue all v1 positives to 2.1M (subset resume on the same dirs).
if [ -n "${POSITIVES// /}" ]; then
  CS=$(echo $POSITIVES | tr ' ' ',')
  if [ ! -f "save/$D/CONTINUE_DONE" ]; then
    echo "=== r5c continuation ($CS) start $(date)"
    python scripts/train_watchdog.py \
      --pidfile /tmp/train_r5c.pid --log "logs/$D/continue.log" \
      -- train.py -backend device -n_env 256 -replay_ratio 1 -n_step 3 \
         -max_total_steps 2100000 -load true \
         -algo $ALGO -lr 5e-5 -seeds "$CS" -obs_dtype bfloat16 \
         -save_dir "save/$D/" -log_dir "logs/$D/" \
      && touch "save/$D/CONTINUE_DONE"
    echo "=== r5c continuation end $(date)"
  fi
  [ -f "save/$D/CONTINUE_DONE" ] || { echo "continuation did not finish"; exit 1; }

  export JAX_PLATFORMS='' PYTHONPATH=''
  for k in $POSITIVES; do
    SD=save/$D/s$k
    FULL=logs/$D/sweep_full_s$k.csv
    if [ ! -f "$FULL" ]; then
      echo "=== full snapshot sweep s$k $(date)"
      python scripts/eval_snapshots.py "$SD" -n 20 \
        --workdir /tmp/r5c_full_s$k > "logs/$D/sweep_full_s$k.log" 2>&1 \
        && cp /tmp/r5c_full_s$k/summary.csv "$FULL"
    fi
    [ -f "$FULL" ] || { echo "s$k full sweep FAILED"; continue; }
    PICK=$(python - "$FULL" <<'PY'
import sys, pandas as pd
t = pd.read_csv(sys.argv[1])
floor = t["worst"].min()
g = t[t["worst"] <= floor + 10.0]
print(g.loc[g["delay"].idxmin(), "pack"])
PY
    )
    [ -n "$PICK" ] && [ -f "$SD/$PICK" ] || { echo "s$k: no pick"; continue; }
    echo "s$k tail-guarded pick: $PICK" | tee logs/$D/pick_s$k.txt
    for cell in "NoisyQrS$k:evaluation/results:" \
                "NoisyQrS${k}Hold:evaluation/results_holdout:--master-seed 142"; do
      tag=${cell%%:*}; rest=${cell#*:}; out=${rest%%:*}; extra=${rest#*:}
      [ -f "$out/results_DQNAgent$tag.csv" ] && { echo "skip $tag"; continue; }
      echo "=== eval $tag $(date)"
      python evaluate.py -s DQNAgent -n 50 --backend native \
        -d "$SD/$PICK" --tag "$tag" -o "$out" $extra \
        > "logs/eval_$tag.log" 2>&1
    done
  done
fi
echo "CHIPQUEUE R5C DONE $(date)"
