#!/bin/bash
# Eval watcher for scripts/run_revalidate.sh — the results go to
# evaluation/results_reval/ under the ORIGINAL tags so summarize.py can
# diff them against the shipped tables row-for-row before deciding
# whether to replace anything. Delegates to eval_watch.sh.
exec bash "$(dirname "$0")/eval_watch.sh" evaluation/results_reval \
  save/reval/qr_lr5:QrDuelingDQNAgent:QrLr5 \
  save/reval/seed3:PerDuelingDoubleDQNAgent:Seed3 \
  save/reval/noisy63:NoisyPerDuelingDQNAgent:Noisy63
