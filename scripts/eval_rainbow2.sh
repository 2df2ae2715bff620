#!/bin/bash
# Eval watcher for the scripts/run_rainbow2.sh queue (IQN + the extra
# NoisyNet robustness seeds). Delegates to eval_watch.sh.
exec bash "$(dirname "$0")/eval_watch.sh" evaluation/results \
  save/rainbow/iqn_lr5:IqnDuelingDQNAgent:Iqn \
  save/rainbow/noisy_s2:NoisyPerDuelingDQNAgent:NoisyS2 \
  save/rainbow/noisy_s3:NoisyPerDuelingDQNAgent:NoisyS3
