#!/bin/bash
# CPU-side watcher for the late round-3 chip jobs: flagship seed 3 and
# the 6.3M NoisyNet run. As each finishes training (save/<dir>/DONE),
# snapshot-sweep it on CPU (20 seeded episodes per checkpoint, selection
# by EVAL delay - never training reward, CLAUDE.md) and run the
# 50-episode seeded evaluation into evaluation/results/ under its tag.
# Idempotent: skips anything whose results CSV already exists.
cd /root/repo
export JAX_PLATFORMS='' PYTHONPATH=''
CONFIGS="save/seeds/s3:PerDuelingDoubleDQNAgent:Seed3:logs/seeds/s3
save/noisy63:NoisyPerDuelingDQNAgent:Noisy63:logs/noisy63"
while :; do
  pending=0
  for c in $CONFIGS; do
    IFS=: read -r d algo tag logd <<< "$c"
    mkdir -p "$logd"
    [ -f "evaluation/results/results_DQNAgent$tag.csv" ] && continue
    if [ ! -f "$d/DONE" ]; then pending=1; continue; fi
    # Failure guard + sweep reuse (same pattern as eval_rainbow.sh): a
    # transient eval failure must retry WITHOUT re-running the whole
    # multi-minute snapshot sweep every loop iteration.
    if [ ! -f "$logd/sweep_summary.csv" ]; then
      echo "=== $tag sweep $(date) ==="
      wd=/tmp/snapshot_eval_$tag
      python scripts/eval_snapshots.py "$d" -n 20 --algo "$algo" \
          --workdir "$wd" > "$logd/sweep.log" 2>&1 \
          || { pending=1; continue; }
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
        > "$logd/eval50.log" 2>&1 || { pending=1; continue; }
    echo "=== $tag done $(date) ==="
  done
  [ "$pending" -eq 0 ] && break
  sleep 120
done
echo "LATE-RUN EVAL DONE $(date)"
