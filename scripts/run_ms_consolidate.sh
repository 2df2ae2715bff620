#!/bin/bash
# Consolidate the K=4 batched noise-robust stack (NoisyIqn seeds 4-7,
# trained by run_noise_robust_ms.sh into save/noise_robust/ms/s{4..7}).
# Per seed: noise-protocol snapshot sweep -> tail-guarded pick -> full
# 8-cell eval matrix (guarded + unguarded x clean/noise x canonical/
# held-out, 50 episodes each). Extends the universal-controller table
# (BENCHMARKS "safety envelope") from 3 noise-trained runs to 7.
#
# Host-side CPU work only (native C++ sim); safe to run alongside chip
# queues. Idempotent: each cell skips if its CSV exists; the sweep
# skips if its summary CSV was already copied out.
cd /root/repo || exit 1
echo $$ > /tmp/ms_consolidate.pid

LOGD=logs/noise_robust/ms
mkdir -p "$LOGD"
export JAX_PLATFORMS='' PYTHONPATH=''

run_cell () {  # run_cell <save_pack> <tag> <outdir> [extra args...]
  local pack=$1 tag=$2 out=$3; shift 3
  [ -f "$out/results_DQNAgent$tag.csv" ] && { echo "skip $tag"; return; }
  echo "=== eval $tag $(date)"
  python evaluate.py -s DQNAgent -n 50 --backend native \
    -d "$pack" --tag "$tag" -o "$out" "$@" \
    > "logs/eval_$tag.log" 2>&1
}

for k in 4 5 6 7; do
  SAVE=save/noise_robust/ms/s$k
  SWEEP="$LOGD/sweep_noise_s$k.csv"
  if [ ! -f "$SWEEP" ]; then
    echo "=== noise-protocol snapshot sweep s$k $(date)"
    python scripts/eval_snapshots.py "$SAVE" \
      -n 20 --noise 0.1 --workdir /tmp/sweep_noise_ms_s$k \
      > "$LOGD/sweep_noise_s$k.log" 2>&1 \
      && cp /tmp/sweep_noise_ms_s$k/summary.csv "$SWEEP"
  fi
  [ -f "$SWEEP" ] || { echo "s$k sweep FAILED — skipping seed"; continue; }

  PICK=$(python - "$SWEEP" <<'PY'
import sys, pandas as pd
t = pd.read_csv(sys.argv[1])
floor = t["worst"].min()
g = t[t["worst"] <= floor + 10.0]
print(g.loc[g["delay"].idxmin(), "pack"])
PY
  )
  [ -n "$PICK" ] && [ -f "$SAVE/$PICK" ] || { echo "s$k: no pick"; continue; }
  echo "s$k noise-protocol pick: $PICK"
  echo "$PICK" > "$LOGD/pick_s$k.txt"

  T=NoiseRobustMsS$k
  # Guarded 4-protocol matrix (universal-controller rows).
  run_cell "$SAVE/$PICK" ${T}Guard          evaluation/results               --guard-occ 20 --guard-cap 1
  run_cell "$SAVE/$PICK" ${T}GuardHold      evaluation/results_holdout       --guard-occ 20 --guard-cap 1 --master-seed 142
  run_cell "$SAVE/$PICK" ${T}GuardNoise     evaluation/results_noise         --guard-occ 20 --guard-cap 1 --noise 0.1
  run_cell "$SAVE/$PICK" ${T}GuardNoiseHold evaluation/results_holdout_noise --guard-occ 20 --guard-cap 1 --noise 0.1 --master-seed 142
  # Unguarded 4-protocol matrix (raw-policy tail exposure).
  run_cell "$SAVE/$PICK" ${T}               evaluation/results
  run_cell "$SAVE/$PICK" ${T}Hold           evaluation/results_holdout       --master-seed 142
  run_cell "$SAVE/$PICK" ${T}Noise          evaluation/results_noise         --noise 0.1
  run_cell "$SAVE/$PICK" ${T}NoiseHold      evaluation/results_holdout_noise --noise 0.1 --master-seed 142
done
echo "MS CONSOLIDATE DONE $(date)"
