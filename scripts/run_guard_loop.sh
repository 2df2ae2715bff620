#!/bin/bash
# Guard-in-the-loop training (round 5, VERDICT #3): repeat the
# noise-robust NoisyIqn recipe (run_noise_robust.sh — sigma=0.1, 2.1M
# steps, lr 5e-5, n-step 3, ratio 1) for train seeds 2 and 3 with the
# env-side safety envelope ACTIVE during training
# (EnvConfig.guard_occ=20 / guard_cap=1 — the deployed guard(20, 10 s)).
# Seeds 2/3 pair exactly against the existing guard-WRAPPED runs
# (save/noise_robust/s2, s3), so the table answers: does training under
# the envelope remove the unguarded held-out tail (7-12/50 collapses)
# from the policy itself?
#
# K=2 seeds train in one vmapped XLA program (f32 replay fits at K=2;
# the solo baselines were f32, keep the recipe identical). Post-steps
# per seed: noise-protocol snapshot sweep (same tail-guarded pick rule
# as the baselines) + the full 8-cell matrix (guarded AND unguarded x
# clean/noise x canonical/held-out).
# Reprovision-safe: resumes via the watchdog; cells skip on existing CSV.
cd /root/repo || exit 1
echo $$ > /tmp/guard_loop.pid
export PYTHONPATH=/root/repo:/root/.axon_site
export MDRLRMC_SNAPSHOT_EVERY=250000

SAVE=save/guard_loop
LOGD=logs/guard_loop
mkdir -p "$SAVE" "$LOGD"

if [ ! -f "$SAVE/DONE" ]; then
  echo "=== guard-in-the-loop train (seeds 2,3) start $(date)"
  python scripts/train_watchdog.py -- \
    python -u train.py -backend device -n_env 256 -replay_ratio 1 \
      -n_step 3 -max_total_steps 2100000 -algo NoisyIqnDuelingDQNAgent \
      -lr 5e-5 -seeds 2,3 -accel_noise 0.1 -guard_occ 20 -guard_cap 1 \
      -load true -save_dir "$SAVE/" -log_dir "$LOGD/" \
      && touch "$SAVE/DONE"
  echo "=== guard-in-the-loop train end $(date)"
fi
[ -f "$SAVE/DONE" ] || { echo "training did not finish"; exit 1; }

export JAX_PLATFORMS='' PYTHONPATH=''
run_cell () {  # run_cell <save_pack> <tag> <outdir> [extra args...]
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
      -n 20 --noise 0.1 --workdir /tmp/sweep_noise_gl_s$k \
      > "$LOGD/sweep_noise_s$k.log" 2>&1 \
      && cp /tmp/sweep_noise_gl_s$k/summary.csv "$SWEEP"
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

  T=GuardLoopS$k
  run_cell "$SD/$PICK" ${T}Guard          evaluation/results               --guard-occ 20 --guard-cap 1
  run_cell "$SD/$PICK" ${T}GuardHold      evaluation/results_holdout       --guard-occ 20 --guard-cap 1 --master-seed 142
  run_cell "$SD/$PICK" ${T}GuardNoise     evaluation/results_noise         --guard-occ 20 --guard-cap 1 --noise 0.1
  run_cell "$SD/$PICK" ${T}GuardNoiseHold evaluation/results_holdout_noise --guard-occ 20 --guard-cap 1 --noise 0.1 --master-seed 142
  run_cell "$SD/$PICK" ${T}               evaluation/results
  run_cell "$SD/$PICK" ${T}Hold           evaluation/results_holdout       --master-seed 142
  run_cell "$SD/$PICK" ${T}Noise          evaluation/results_noise         --noise 0.1
  run_cell "$SD/$PICK" ${T}NoiseHold      evaluation/results_holdout_noise --noise 0.1 --master-seed 142
done
echo "GUARD LOOP PIPELINE DONE $(date)"
