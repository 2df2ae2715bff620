#!/bin/bash
# Chip queue 4a: the FIRST production multi-seed run — 4 fresh NoisyQr
# seeds (7-10) trained in ONE vmapped XLA program (sim/train_multiseed.py)
# instead of round 3's serialized per-seed queue. Purpose:
#   1. "the next sweep actually uses it" (VERDICT r3 item 3);
#   2. wall-clock row for BENCHMARKS (K=4 stacked vs 4x solo ~80 min);
#   3. more ~29-mode samples (P(~29) ~ 1/2 per seed so far);
#   4. test the early-decidability hypothesis: every ~29 QR seed's best
#      snapshot was at 250-375k and no ~31 QR seed ever had a sub-30
#      snapshot — if that holds on 4 fresh seeds, a 500k screen predicts
#      the final tier (BENCHMARKS "what the ~29 mode does" section).
# Memory: the hybrid obs is 284 floats and the TPU lane-pads [N,284] f32
# to [N,384] — the f32 obs/next_obs pair is ~3.1 GB/seed at 1M capacity,
# so K=4 f32 does NOT compile (measured 20.1G > 15.75G HBM, two 5.72G
# remat-uncompress temps). -obs_dtype bfloat16 halves replay obs storage
# (~1.5 GB/seed; inserts cast down, samples cast back to f32) and K=4 at
# full 1M capacity fits with headroom.
# Reprovision-safe: skips on DONE, resumes via the watchdog's -load true
# (multi-seed resume is all-or-nothing across per-seed state saves).
cd /root/repo
echo $$ > /tmp/chipqueue_r4a.pid
export PYTHONPATH=/root/repo:/root/.axon_site
export MDRLRMC_SNAPSHOT_EVERY=125000

D=rainbow/ms_probe
mkdir -p "save/$D" "logs/$D"
if [ -f "save/$D/DONE" ]; then
  echo "$D already done"
else
  echo "=== $D start $(date) ==="
  python scripts/train_watchdog.py \
    --pidfile /tmp/train_ms_probe.pid \
    --log "logs/$D/train.log" \
    -- train.py -backend device -n_env 256 -replay_ratio 1 -n_step 3 \
       -max_total_steps 2100000 -load false \
       -algo NoisyQrDuelingDQNAgent -lr 5e-5 -seeds 7,8,9,10 \
       -obs_dtype bfloat16 \
       -save_dir "save/$D/" -log_dir "logs/$D/" \
    && touch "save/$D/DONE" save/$D/s7/DONE save/$D/s8/DONE \
             save/$D/s9/DONE save/$D/s10/DONE
  echo "=== $D end $(date) ==="
fi
echo "CHIPQUEUE R4A DONE $(date)"
