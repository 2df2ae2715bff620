#!/bin/bash
# Eval watcher for scripts/run_chipqueue_r3b.sh (NoisyQr at the full
# 6.3M flagship budget). Delegates to eval_watch.sh.
exec bash "$(dirname "$0")/eval_watch.sh" evaluation/results \
  save/rainbow/noisyqr63:NoisyQrDuelingDQNAgent:NoisyQr63
