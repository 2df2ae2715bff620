#!/bin/bash
# Noise-robust training, NoisyQr head (round 4 follow-up). The
# universal-controller result (BENCHMARKS "safety envelope") rests on
# two NoisyIqn train seeds; this queue tests whether noise-robust
# training generalizes across distributional heads by repeating the
# exact s2 recipe with NoisyQrDuelingDQNAgent (same train seed 2, same
# sigma=0.1, same 2.1M budget, same noise-protocol tail-guarded
# snapshot selection), then running the guarded 4-protocol matrix
# (clean/noise x canonical/held-out, guard 20%/cap 10 s).
# Reprovision-safe: skips on DONE, resumes via the watchdog.
cd /root/repo
echo $$ > /tmp/noise_robust_qr.pid
export PYTHONPATH=/root/repo:/root/.axon_site
export MDRLRMC_SNAPSHOT_EVERY=250000

SAVE=save/noise_robust/qr_s2
LOGD=logs/noise_robust/qr_s2
mkdir -p "$SAVE" "$LOGD"

if [ ! -f "$SAVE/DONE" ]; then
  echo "=== noise-robust qr train start $(date)"
  python scripts/train_watchdog.py -- \
    python -u train.py -backend device -n_env 256 -replay_ratio 1 \
      -n_step 3 -max_total_steps 2100000 -algo NoisyQrDuelingDQNAgent \
      -lr 5e-5 -seed 2 -accel_noise 0.1 -load true \
      -save_dir "$SAVE/" -log_dir "$LOGD/" \
      && touch "$SAVE/DONE"
  echo "=== noise-robust qr train end $(date)"
fi

echo "=== noise-protocol snapshot sweep $(date)"
JAX_PLATFORMS='' PYTHONPATH='' python scripts/eval_snapshots.py "$SAVE" \
  -n 20 --noise 0.1 --workdir /tmp/sweep_noise_qr \
  > "$LOGD/sweep_noise.log" 2>&1
cp /tmp/sweep_noise_qr/summary.csv "$LOGD/sweep_noise_summary.csv"

PICK=$(python - <<'PY'
import pandas as pd
t = pd.read_csv("/tmp/sweep_noise_qr/summary.csv")
floor = t["worst"].min()
g = t[t["worst"] <= floor + 10.0]
print(g.loc[g["delay"].idxmin(), "pack"])
PY
)
[ -n "$PICK" ] && [ -f "$SAVE/$PICK" ] || { echo "no pick (sweep failed?)"; exit 1; }
echo "noise-protocol pick: $PICK"

export JAX_PLATFORMS='' PYTHONPATH=''
run_cell () {  # run_cell <tag> <outdir> [extra evaluate.py args...]
  local tag=$1 out=$2; shift 2
  [ -f "$out/results_DQNAgent$tag.csv" ] && { echo "skip $tag"; return; }
  echo "=== eval $tag $(date)"
  python evaluate.py -s DQNAgent -n 50 --backend native \
    -d "$SAVE/$PICK" --tag "$tag" -o "$out" "$@" \
    > "logs/eval_$tag.log" 2>&1
}
# Guarded 4-protocol matrix (the universal-controller table rows).
run_cell NoiseRobustQrS2Guard        evaluation/results                 --guard-occ 20 --guard-cap 1
run_cell NoiseRobustQrS2GuardHold    evaluation/results_holdout         --guard-occ 20 --guard-cap 1 --master-seed 142
run_cell NoiseRobustQrS2GuardNoise   evaluation/results_noise           --guard-occ 20 --guard-cap 1 --noise 0.1
run_cell NoiseRobustQrS2GuardNoiseHold evaluation/results_holdout_noise --guard-occ 20 --guard-cap 1 --noise 0.1 --master-seed 142
# Unguarded 4-protocol cells (tail exposure of the raw policy).
run_cell NoiseRobustQrS2             evaluation/results
run_cell NoiseRobustQrS2Hold         evaluation/results_holdout         --master-seed 142
run_cell NoiseRobustQrS2Noise01      evaluation/results_noise           --noise 0.1
run_cell NoiseRobustQrS2NoiseHold    evaluation/results_holdout_noise   --noise 0.1 --master-seed 142
echo "NOISE ROBUST QR PIPELINE DONE $(date)"
