#!/bin/bash
# Guard-in-the-loop dose-response (round 5, follow-up to
# run_guard_loop.sh): the occ-20 training envelope shrank the unguarded
# held-out tail 3x but left 1-4 collapses/50 (BENCHMARKS
# "Guard-in-the-loop training"). This trains the SAME two seeds with a
# TIGHTER training trigger (guard_occ 18 — still above the 17% that
# destroys the ~29 operating mode, but one notch into the band the
# collapse precursor rides) to test whether a stricter training
# envelope removes the unguarded tail entirely, and at what cost to the
# guarded mean. Deployment guard in the eval matrix stays guard(20,
# 10 s) for comparability with every other row; unguarded cells answer
# the tail question. Reprovision-safe (DONE markers, watchdog, CSV skip).
cd /root/repo || exit 1
echo $$ > /tmp/guard_loop18.pid
export PYTHONPATH=/root/repo:/root/.axon_site
export MDRLRMC_SNAPSHOT_EVERY=250000

SAVE=save/guard_loop18
LOGD=logs/guard_loop18
mkdir -p "$SAVE" "$LOGD"

if [ ! -f "$SAVE/DONE" ]; then
  echo "=== guard-in-the-loop(18) train (seeds 2,3) start $(date)"
  python scripts/train_watchdog.py \
    --pidfile /tmp/train_gl18.pid --log "$LOGD/train.log" \
    -- train.py -backend device -n_env 256 -replay_ratio 1 \
      -n_step 3 -max_total_steps 2100000 -algo NoisyIqnDuelingDQNAgent \
      -lr 5e-5 -seeds 2,3 -accel_noise 0.1 -guard_occ 18 -guard_cap 1 \
      -load true -save_dir "$SAVE/" -log_dir "$LOGD/" \
      && touch "$SAVE/DONE"
  echo "=== guard-in-the-loop(18) train end $(date)"
fi
[ -f "$SAVE/DONE" ] || { echo "training did not finish"; exit 1; }

export JAX_PLATFORMS='' PYTHONPATH=''
run_cell () {  # run_cell <pack> <tag> <outdir> [extra args...]
  local pack=$1 tag=$2 out=$3; shift 3
  [ -f "$out/results_DQNAgent$tag.csv" ] && { echo "skip $tag"; return; }
  echo "=== eval $tag $(date)"
  python evaluate.py -s DQNAgent -n 50 --backend native \
    -d "$pack" --tag "$tag" -o "$out" "$@" \
    > "logs/eval_$tag.log" 2>&1
}

for k in 2 3; do
  SD=$SAVE/s$k
  SWEEP="$LOGD/sweep_noise_s$k.csv"
  if [ ! -f "$SWEEP" ]; then
    echo "=== noise-protocol snapshot sweep s$k $(date)"
    python scripts/eval_snapshots.py "$SD" \
      -n 20 --noise 0.1 --workdir /tmp/sweep_noise_gl18_s$k \
      > "$LOGD/sweep_noise_s$k.log" 2>&1 \
      && cp /tmp/sweep_noise_gl18_s$k/summary.csv "$SWEEP"
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
  [ -n "$PICK" ] && [ -f "$SD/$PICK" ] || { echo "s$k: no pick"; continue; }
  echo "s$k noise-protocol pick: $PICK"
  echo "$PICK" > "$LOGD/pick_s$k.txt"

  T=GuardLoop18S$k
  run_cell "$SD/$PICK" ${T}Guard          evaluation/results               --guard-occ 20 --guard-cap 1
  run_cell "$SD/$PICK" ${T}GuardHold      evaluation/results_holdout       --guard-occ 20 --guard-cap 1 --master-seed 142
  run_cell "$SD/$PICK" ${T}GuardNoise     evaluation/results_noise         --guard-occ 20 --guard-cap 1 --noise 0.1
  run_cell "$SD/$PICK" ${T}GuardNoiseHold evaluation/results_holdout_noise --guard-occ 20 --guard-cap 1 --noise 0.1 --master-seed 142
  run_cell "$SD/$PICK" ${T}               evaluation/results
  run_cell "$SD/$PICK" ${T}Hold           evaluation/results_holdout       --master-seed 142
  run_cell "$SD/$PICK" ${T}Noise          evaluation/results_noise         --noise 0.1
  run_cell "$SD/$PICK" ${T}NoiseHold      evaluation/results_holdout_noise --noise 0.1 --master-seed 142
done
echo "GUARD LOOP 18 PIPELINE DONE $(date)"
