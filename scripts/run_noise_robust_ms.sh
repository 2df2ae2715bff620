#!/bin/bash
# Batched noise-robust seed sweep: K=4 fresh NoisyIqn seeds trained at
# sigma=0.1 in ONE vmapped XLA program (sim/train_multiseed.py; the
# noise x multi-seed composition is bit-match-pinned by
# tests/test_multiseed.py::test_multiseed_noise_mode_bit_matches_solo).
# Purpose: widen the universal-controller replication (BENCHMARKS
# "safety envelope" — currently NoisyIqn s2/s3 + NoisyQr) from 2 to 6
# independent noise-trained seeds for ~1 chip-pass of wall clock.
#
# Budget: 2.1M steps/seed at ~1,670 TOTAL env-steps/s for K=4 =>
# ~85 min on one v5e. bf16 replay obs is REQUIRED at K=4 (HBM fit —
# see CLAUDE.md multi-seed note). Reprovision-safe: resumes via
# -load true; skips on DONE.
#
# Post-steps per seed (host side): noise-protocol tail-guarded sweep +
# guarded 4-protocol matrix — reuse run_noise_robust_qr.sh's cell
# runner with SAVE=save/noise_robust/ms/s<k>.
cd /root/repo
echo $$ > /tmp/noise_robust_ms.pid
export PYTHONPATH=/root/repo:/root/.axon_site
export MDRLRMC_SNAPSHOT_EVERY=250000

SAVE=save/noise_robust/ms
LOGD=logs/noise_robust/ms
mkdir -p "$SAVE" "$LOGD"

if [ ! -f "$SAVE/DONE" ]; then
  echo "=== batched noise-robust train (seeds 4-7) start $(date)"
  python scripts/train_watchdog.py -- \
    python -u train.py -backend device -n_env 256 -replay_ratio 1 \
      -n_step 3 -max_total_steps 2100000 -algo NoisyIqnDuelingDQNAgent \
      -lr 5e-5 -seeds 4,5,6,7 -obs_dtype bfloat16 -accel_noise 0.1 \
      -load true -save_dir "$SAVE/" -log_dir "$LOGD/" \
      && touch "$SAVE/DONE"
  echo "=== batched noise-robust train end $(date)"
fi
echo "NOISE ROBUST MS TRAIN DONE $(date) — run host sweeps per seed next"
