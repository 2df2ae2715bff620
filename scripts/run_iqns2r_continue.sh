#!/bin/bash
# Decide the IqnS2R outcome (round 5 follow-up): the out-of-time
# NoisyIqn-seed-2 replication screened v1-positive and RAZOR-tiered
# (BENCHMARKS "Screen v2"). Continue it to 2.1M like any
# screen-positive and evaluate at n=50 canonical + held-out, turning
# the suggestive razor point into a decided one — the v3 hypothesis
# predicts either a touched-and-degenerate FP or an s10-style TP with
# a latent tail. Reprovision-safe (DONE marker, watchdog, CSV skip).
cd /root/repo || exit 1
echo $$ > /tmp/iqns2r_cont.pid
export PYTHONPATH=/root/repo:/root/.axon_site
export MDRLRMC_SNAPSHOT_EVERY=125000

D=rainbow/iqns2_rescreen
if [ ! -f "save/$D/CONTINUE_DONE" ]; then
  echo "=== iqns2r continuation start $(date)"
  python scripts/train_watchdog.py \
    --pidfile /tmp/train_iqns2r.pid --log "logs/$D/continue.log" \
    -- train.py -backend device -n_env 256 -replay_ratio 1 -n_step 3 \
       -max_total_steps 2100000 -load true \
       -algo NoisyIqnDuelingDQNAgent -lr 5e-5 -seed 2 \
       -save_dir "save/$D/" -log_dir "logs/$D/" \
    && touch "save/$D/CONTINUE_DONE"
  echo "=== iqns2r continuation end $(date)"
fi
[ -f "save/$D/CONTINUE_DONE" ] || { echo "continuation did not finish"; exit 1; }

export JAX_PLATFORMS='' PYTHONPATH=''
FULL=logs/$D/sweep_full.csv
if [ ! -f "$FULL" ]; then
  echo "=== full snapshot sweep $(date)"
  python scripts/eval_snapshots.py "save/$D" -n 20 \
    --workdir /tmp/iqns2r_full > "logs/$D/sweep_full.log" 2>&1 \
    && cp /tmp/iqns2r_full/summary.csv "$FULL"
fi
[ -f "$FULL" ] || { echo "full sweep FAILED"; exit 1; }
PICK=$(python - "$FULL" <<'PY'
import sys, pandas as pd
t = pd.read_csv(sys.argv[1])
floor = t["worst"].min()
g = t[t["worst"] <= floor + 10.0]
print(g.loc[g["delay"].idxmin(), "pack"])
PY
)
[ -n "$PICK" ] && [ -f "save/$D/$PICK" ] || { echo "no pick"; exit 1; }
echo "IqnS2R tail-guarded pick: $PICK" | tee logs/$D/pick.txt
for cell in "IqnS2R:evaluation/results:" \
            "IqnS2RHold:evaluation/results_holdout:--master-seed 142"; do
  tag=${cell%%:*}; rest=${cell#*:}; out=${rest%%:*}; extra=${rest#*:}
  [ -f "$out/results_DQNAgent$tag.csv" ] && { echo "skip $tag"; continue; }
  echo "=== eval $tag $(date)"
  python evaluate.py -s DQNAgent -n 50 --backend native \
    -d "save/$D/$PICK" --tag "$tag" -o "$out" $extra \
    > "logs/eval_$tag.log" 2>&1
done
echo "IQNS2R CONTINUE DONE $(date)"
