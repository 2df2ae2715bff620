#!/bin/bash
# Round-5 chip sequencer: runs the three queued round-5 experiments
# strictly serially on the one TPU (CLAUDE.md: one TPU process at a
# time). Each child script is reprovision-safe (DONE markers, watchdog
# resume, skip-on-CSV), so rerunning this driver after a reprovision
# resumes wherever it left off.
#   1. r5a  — prospective screen-v2 validation (NoisyQr seeds 15-18)
#   2. gl18 — guard-in-the-loop occ-18 dose-response (NoisyIqn s2,s3)
#   3. iqns2r — recover the 9th screen-v2 retro data point
cd /root/repo || exit 1
echo $$ > /tmp/chipqueue_r5_all.pid
{
  echo "=== R5 SEQUENCER start $(date)"
  bash scripts/run_chipqueue_r5a.sh
  echo "=== r5a exited rc=$? $(date)"
  bash scripts/run_guard_loop18.sh
  echo "=== gl18 exited rc=$? $(date)"
  bash scripts/run_iqns2_rescreen.sh
  echo "=== iqns2r exited rc=$? $(date)"
  echo "=== R5 SEQUENCER DONE $(date)"
} 2>&1
