#!/bin/bash
# CPU-side evaluation watcher for the scripts/run_rainbow2.sh configs
# (IQN + the extra NoisyNet seeds) — same protocol as eval_rainbow.sh:
# snapshot-sweep by 20-episode eval delay, then the canonical 50-episode
# evaluation of the best checkpoint into evaluation/results/.
cd /root/repo
export JAX_PLATFORMS='' PYTHONPATH=''
CONFIGS="rainbow/iqn_lr5:IqnDuelingDQNAgent:Iqn
rainbow/noisy_s2:NoisyPerDuelingDQNAgent:NoisyS2
rainbow/noisy_s3:NoisyPerDuelingDQNAgent:NoisyS3"
while :; do
  pending=0
  for c in $CONFIGS; do
    d=save/${c%%:*}; rest=${c#*:}; algo=${rest%%:*}; tag=${rest#*:}
    logd=logs/${c%%:*}
    mkdir -p "$logd"
    [ -f "$logd/eval50_done" ] && continue
    if [ ! -f "$d/DONE" ]; then pending=1; continue; fi
    if [ ! -f "$logd/sweep_summary.csv" ]; then
      echo "=== sweep $d $(date) ==="
      wd=/tmp/snapshot_eval_$tag
      python scripts/eval_snapshots.py "$d" -n 20 --algo "$algo" \
          --workdir "$wd" > "$logd/sweep.log" 2>&1 || { pending=1; continue; }
      cp "$wd/summary.csv" "$logd/sweep_summary.csv"
    fi
    best=$(python - <<PY
import pandas as pd
t = pd.read_csv("$logd/sweep_summary.csv")
print(t.loc[t["delay"].idxmin(), "pack"])
PY
)
    echo "=== $tag best: $best; 50-ep eval $(date) ==="
    python evaluate.py -s DQNAgent -n 50 --master-seed 42 --backend native \
        -d "$d/$best" --tag "$tag" -o evaluation/results \
        > "$logd/eval50.log" 2>&1 && touch "$logd/eval50_done"
  done
  [ "$pending" -eq 0 ] && break
  sleep 120
done
echo "RAINBOW2 EVAL DONE $(date)"
