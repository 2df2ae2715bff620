#!/bin/bash
# Host-protocol (native f64 C++ sim) driver-noise stress evaluations:
# 50 canonical episodes (master seed 42) at accel_noise_sigma=0.1 for the
# deployment candidates, the scalar flagship, and the classical bars.
# Noise-mode numbers form their own protocol (BENCHMARKS "Driver-noise
# mode") — compare only within this table. Idempotent per existing CSV.
cd /root/repo
export JAX_PLATFORMS='' PYTHONPATH=''
echo $$ > /tmp/noise_stress.pid
OUT=evaluation/results_noise
run () {  # run <strategy> <tag> [pack]
  [ -f "$OUT/results_$1$2.csv" ] && { echo "skip $1$2"; return; }
  echo "=== $1$2 $(date)"
  if [ -n "$3" ]; then
    python evaluate.py -s "$1" -n 50 --backend native --noise 0.1 \
      -d "$3" --tag "$2" -o "$OUT" > "logs/noise_$1$2.log" 2>&1
  else
    python evaluate.py -s "$1" -n 50 --backend native --noise 0.1 \
      --tag "$2" -o "$OUT" > "logs/noise_$1$2.log" 2>&1
  fi
}
run FixedCycleBaseline Noise01
run AlineaDsBaseline Noise01
# Static greens 25 and 30 (action indices 4, 5): the noise response of the
# fixed policies brackets the learned ones.
python scripts/eval_static_greens.py -n 50 -o "$OUT" --actions 4 5 \
  --noise 0.1 --tag-suffix Noise01 >> logs/noise_static.log 2>&1
run DQNAgent NoisyIqnS2Noise01 save/rainbow/noisyiqn_s2/NoisyIqnDuelingDQNAgent_lr5e-05_step1000k_model.pack
run DQNAgent NoisyIqnS4Noise01 save/rainbow/noisyiqn_s4/NoisyIqnDuelingDQNAgent_lr5e-05_step375k_model.pack
run DQNAgent NoisyQrS5Noise01 save/rainbow/noisyqr_s5/NoisyQrDuelingDQNAgent_lr5e-05_step250k_model.pack
run DQNAgent FlagshipNoise01 save/1ramp_1x3/PerDuelingDoubleDQNAgent_lr0.0001_model.pack
echo "NOISE STRESS EVALS DONE $(date)"
