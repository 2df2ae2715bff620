#!/bin/bash
# Noise-robust training experiment (round 4; BENCHMARKS "noise stress
# test"). Open question it answers: can an agent TRAINED under
# driver-imperfection noise (accel_noise_sigma=0.1) beat FixedCycle's
# noise-protocol 33.84 with a bounded tail — i.e. is the ~29 agents'
# noise collapse a property of the mode they found, or of training on a
# deterministic simulator?
#
# Chip: one 2.1M NoisyIqn run at sigma=0.1 (device backend; the noise
# rides the fused Pallas kernel as a pre-drawn input). Then host-side:
# snapshot sweep UNDER THE NOISE PROTOCOL (deploy-protocol selection),
# 50-ep canonical noise eval + clean eval of the pick.
cd /root/repo
echo $$ > /tmp/noise_robust.pid
export MDRLRMC_SNAPSHOT_EVERY=250000

SAVE=save/noise_robust/s2
LOGD=logs/noise_robust/s2
mkdir -p "$SAVE" "$LOGD"

if [ ! -f "$SAVE/DONE" ]; then
  echo "=== noise-robust train start $(date)"
  python scripts/train_watchdog.py -- \
    python -u train.py -backend device -n_env 256 -replay_ratio 1 \
      -n_step 3 -max_total_steps 2100000 -algo NoisyIqnDuelingDQNAgent \
      -lr 5e-5 -seed 2 -accel_noise 0.1 -load true \
      -save_dir "$SAVE/" -log_dir "$LOGD/" \
      && touch "$SAVE/DONE"
  echo "=== noise-robust train end $(date)"
fi

echo "=== noise-protocol snapshot sweep $(date)"
JAX_PLATFORMS='' PYTHONPATH='' python scripts/eval_snapshots.py "$SAVE" \
  -n 20 --noise 0.1 --workdir /tmp/sweep_noise_robust \
  > "$LOGD/sweep_noise.log" 2>&1
cp /tmp/sweep_noise_robust/summary.csv "$LOGD/sweep_noise_summary.csv"

PICK=$(python - <<'PY'
import pandas as pd
t = pd.read_csv("/tmp/sweep_noise_robust/summary.csv")
floor = t["worst"].min()
g = t[t["worst"] <= floor + 10.0]
print(g.loc[g["delay"].idxmin(), "pack"])
PY
)
echo "noise-protocol pick: $PICK"

export JAX_PLATFORMS='' PYTHONPATH=''
python evaluate.py -s DQNAgent -n 50 --backend native --noise 0.1 \
  -d "$SAVE/$PICK" --tag NoiseRobustS2Noise01 -o evaluation/results_noise \
  > logs/noise_DQNAgentNoiseRobustS2Noise01.log 2>&1
python evaluate.py -s DQNAgent -n 50 --backend native \
  -d "$SAVE/$PICK" --tag NoiseRobustS2 -o evaluation/results \
  > logs/eval_NoiseRobustS2.log 2>&1
echo "NOISE ROBUST PIPELINE DONE $(date)"
