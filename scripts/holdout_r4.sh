#!/bin/bash
# Held-out validation (master seed 142, 50 fresh episodes) of the round-4
# ~29-tier candidates, mirroring the round-3 holdout protocol
# (evaluation/results_holdout/). Waits for the r4b eval watcher to finish
# (the single CPU core is shared), then validates:
#   - NoisyQr s10 500k (the r4a ~29 seed), always;
#   - any r4b NoisyIqn seed whose canonical 50-ep mean is < 30.0
#     (its tracked tail-guarded pick).
# Idempotent: skips any holdout CSV that already exists.
cd /root/repo
export JAX_PLATFORMS='' PYTHONPATH=''
echo $$ > /tmp/holdout_r4.pid

for s in 6 7 8 9; do
  until [ -f "evaluation/results/results_DQNAgentNoisyIqnS$s.csv" ]; do
    sleep 120
  done
done
echo "=== r4b evals complete; selecting candidates $(date)"

run_holdout () {  # run_holdout <pack> <tag>
  [ -f "evaluation/results_holdout/results_DQNAgent$2.csv" ] && {
    echo "skip $2: holdout exists"; return; }
  echo "=== holdout $2 ($1) $(date)"
  python evaluate.py -s DQNAgent -n 50 --master-seed 142 --backend native \
    -d "$1" --tag "$2" -o evaluation/results_holdout \
    > "logs/holdout_$2.log" 2>&1
  echo "=== holdout $2 done $(date)"
}

run_holdout save/rainbow/ms_probe/s10/NoisyQrDuelingDQNAgent_lr5e-05_step500k_model.pack NoisyQrS10

for s in 6 7 8 9; do
  mean=$(python - <<PY
import csv
rows = list(csv.DictReader(open("evaluation/results/results_DQNAgentNoisyIqnS$s.csv")))
print(sum(float(r["avg_time_loss"]) for r in rows) / len(rows))
PY
)
  if python -c "exit(0 if float('$mean') < 30.0 else 1)"; then
    # The watcher's pick is the tracked pack; find it from the sweep log.
    pick=$(python - <<PY
import pandas as pd
t = pd.read_csv("logs/rainbow/ms_probe_iqn/s$s/sweep_summary.csv")
floor = t["worst"].min()
g = t[t["worst"] <= floor + 10.0]
print(g.loc[g["delay"].idxmin(), "pack"])
PY
)
    run_holdout "save/rainbow/ms_probe_iqn/s$s/$pick" "NoisyIqnS$s"
  else
    echo "NoisyIqn s$s mean $mean >= 30.0 -> no holdout"
  fi
done
echo "HOLDOUT R4 DONE $(date)"
