#!/bin/bash
# CPU-side evaluation watcher for scripts/run_revalidate.sh — same
# protocol as eval_rainbow.sh (snapshot-sweep by 20-episode eval delay,
# then the canonical 50-episode eval of the best checkpoint), but the
# results go to evaluation/results_reval/ under the ORIGINAL tags so
# summarize.py can diff them against the shipped tables row-for-row
# before deciding whether to replace anything.
cd /root/repo
export JAX_PLATFORMS='' PYTHONPATH=''
CONFIGS="reval/qr_lr5:QrDuelingDQNAgent:QrLr5
reval/seed3:PerDuelingDoubleDQNAgent:Seed3
reval/noisy63:NoisyPerDuelingDQNAgent:Noisy63"
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
      wd=/tmp/snapshot_eval_reval_$tag
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
        -d "$d/$best" --tag "$tag" -o evaluation/results_reval \
        > "$logd/eval50.log" 2>&1 && touch "$logd/eval50_done"
  done
  [ "$pending" -eq 0 ] && break
  sleep 120
done
echo "REVALIDATE EVAL DONE $(date)"
