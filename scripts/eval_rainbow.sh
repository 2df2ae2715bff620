#!/bin/bash
# CPU-side evaluation watcher for the full-Rainbow runs
# (scripts/run_rainbow.sh). As each config finishes training
# (save/<dir>/DONE), its 250k-step snapshots are swept with the seeded
# 20-episode eval; the best-by-delay checkpoint then gets the canonical
# 50-episode evaluation into evaluation/results/. Checkpoint selection is
# by EVAL delay, never training reward (CLAUDE.md). Runs fully on CPU
# (JAX_PLATFORMS='' PYTHONPATH='' — with axon on PYTHONPATH even an empty
# JAX_PLATFORMS selects the TPU) so the chip stays free for training.
cd /root/repo
export JAX_PLATFORMS='' PYTHONPATH=''
CONFIGS="rainbow/noisyqr_lr5:NoisyQrDuelingDQNAgent:NoisyQr
rainbow/qr_lr5_s1:QrDuelingDQNAgent:QrLr5S1
rainbow/noisyc51_lr5:NoisyC51DuelingDQNAgent:NoisyC51"
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
echo "RAINBOW EVAL DONE $(date)"
