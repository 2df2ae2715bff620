#!/bin/bash
# CPU-side evaluation watcher for the NoisyNet run + the distributional
# hyperparameter sweep (VERDICT r2 item 7). As each config's training
# completes (save/<dir>/DONE appears), snapshot-sweep its checkpoints on
# CPU with the seeded 20-episode eval and record the per-checkpoint
# summary; checkpoint selection is by EVAL delay, never training reward
# (CLAUDE.md). Runs fully on CPU (JAX_PLATFORMS='' PYTHONPATH='' — with
# axon on PYTHONPATH even an empty JAX_PLATFORMS selects the TPU).
cd /root/repo
export JAX_PLATFORMS='' PYTHONPATH=''
CONFIGS="noisy:NoisyPerDuelingDQNAgent
dist_sweep/c51_a31:C51DuelingDQNAgent
dist_sweep/c51_wide:C51DuelingDQNAgent
dist_sweep/c51_lr5:C51DuelingDQNAgent
dist_sweep/qr_k32:QrDuelingDQNAgent
dist_sweep/qr_lr5:QrDuelingDQNAgent"
for c in $CONFIGS; do
  d=${c%%:*}; algo=${c#*:}
  logd=logs/$d
  mkdir -p "$logd"
  while [ ! -f "save/$d/DONE" ]; do sleep 120; done
  [ -f "$logd/sweep_summary.csv" ] && { echo "$d already swept"; continue; }
  echo "=== sweep $d $(date) ==="
  wd=/tmp/snapshot_eval_$(basename "$d")
  python scripts/eval_snapshots.py "save/$d" -n 20 --algo "$algo" \
      --workdir "$wd" > "$logd/sweep.log" 2>&1
  cp "$wd/summary.csv" "$logd/sweep_summary.csv"
  echo "=== sweep $d done $(date) ==="
done
echo "DIST SWEEP EVAL DONE $(date)"
