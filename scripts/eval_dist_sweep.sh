#!/bin/bash
# CPU-side evaluation watcher for the NoisyNet run + the distributional
# hyperparameter sweep (VERDICT r2 item 7). Polls ALL configs each cycle
# and sweeps whichever has finished training (save/<dir>/DONE) — a
# crashed config can never block the evaluation of the others. As each
# completes, its checkpoints are snapshot-swept on CPU with the seeded
# 20-episode eval; checkpoint selection is by EVAL delay, never training
# reward (CLAUDE.md). Runs fully on CPU (JAX_PLATFORMS='' PYTHONPATH=''
# — with axon on PYTHONPATH even an empty JAX_PLATFORMS selects the TPU).
cd /root/repo
export JAX_PLATFORMS='' PYTHONPATH=''
CONFIGS="noisy:NoisyPerDuelingDQNAgent
dist_sweep/c51_a31:C51DuelingDQNAgent
dist_sweep/c51_wide:C51DuelingDQNAgent
dist_sweep/c51_lr5:C51DuelingDQNAgent
dist_sweep/qr_k32:QrDuelingDQNAgent
dist_sweep/qr_lr5:QrDuelingDQNAgent"
while :; do
  pending=0
  for c in $CONFIGS; do
    d=${c%%:*}; algo=${c#*:}
    logd=logs/$d
    mkdir -p "$logd"
    [ -f "$logd/sweep_summary.csv" ] && continue
    if [ ! -f "save/$d/DONE" ]; then pending=1; continue; fi
    echo "=== sweep $d $(date) ==="
    wd=/tmp/snapshot_eval_$(basename "$d")
    python scripts/eval_snapshots.py "save/$d" -n 20 --algo "$algo" \
        --workdir "$wd" > "$logd/sweep.log" 2>&1
    cp "$wd/summary.csv" "$logd/sweep_summary.csv"
    echo "=== sweep $d done $(date) ==="
  done
  [ "$pending" -eq 0 ] && break
  sleep 120
done
echo "DIST SWEEP EVAL DONE $(date)"
