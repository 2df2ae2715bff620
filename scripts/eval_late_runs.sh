#!/bin/bash
# Eval watcher for the late round-3 chip jobs: flagship seed 3 and the
# 6.3M NoisyNet run. Delegates to eval_watch.sh.
exec bash "$(dirname "$0")/eval_watch.sh" evaluation/results \
  save/seeds/s3:PerDuelingDoubleDQNAgent:Seed3:logs/seeds/s3 \
  save/noisy63:NoisyPerDuelingDQNAgent:Noisy63:logs/noisy63
