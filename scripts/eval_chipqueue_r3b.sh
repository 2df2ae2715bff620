#!/bin/bash
# CPU-side evaluation watcher for scripts/run_chipqueue_r3b.sh — snapshot
# sweep (20-episode eval delay) then 50-episode eval of the best
# checkpoint, same protocol as eval_rainbow.sh.
cd /root/repo
export JAX_PLATFORMS='' PYTHONPATH=''
CONFIGS="rainbow/noisyqr63:NoisyQrDuelingDQNAgent:NoisyQr63"
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
    [ -n "$best" ] || { pending=1; continue; }
    echo "=== $tag best: $best; 50-ep eval $(date) ==="
    python evaluate.py -s DQNAgent -n 50 --master-seed 42 --backend native \
        -d "$d/$best" --tag "$tag" -o evaluation/results \
        > "$logd/eval50.log" 2>&1 && touch "$logd/eval50_done"
  done
  [ "$pending" -eq 0 ] && break
  sleep 120
done
echo "CHIPQUEUE R3B EVAL DONE $(date)"
