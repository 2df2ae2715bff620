#!/bin/bash
# Post-process the multi-seed flagship runs: as each seed's training
# completes (save/seeds/s<k>/DONE), snapshot-sweep it on CPU, pick the
# best checkpoint by EVAL delay (never by training reward), and run the
# 50-episode seeded evaluation tagged Seed<k> into evaluation/results/.
cd /root/repo
export JAX_PLATFORMS='' PYTHONPATH=''
for s in 1 2 3; do
  d=save/seeds/s$s
  while [ ! -f $d/DONE ]; do sleep 120; done
  echo "=== sweep seed $s $(date) ==="
  python scripts/eval_snapshots.py $d -n 20 --algo PerDuelingDoubleDQNAgent \
      > logs/seeds/s$s/sweep.log 2>&1
  cp /tmp/snapshot_eval/summary.csv logs/seeds/s$s/sweep_summary.csv
  best=$(python - <<PY
import pandas as pd
t = pd.read_csv("logs/seeds/s$s/sweep_summary.csv")
print(t.loc[t["delay"].idxmin(), "pack"])
PY
)
  echo "seed $s best: $best"
  python evaluate.py -s DQNAgent -n 50 --master-seed 42 --backend native \
      -d $d/$best --tag Seed$s -o evaluation/results \
      > logs/seeds/s$s/eval50.log 2>&1
  echo "=== seed $s eval done $(date) ==="
done
echo "MULTISEED EVAL DONE $(date)"
