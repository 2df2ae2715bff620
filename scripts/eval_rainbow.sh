#!/bin/bash
# Eval watcher for the scripts/run_rainbow.sh queue (full-Rainbow heads
# + the QR lr5e-5 replication seed). Delegates to eval_watch.sh.
exec bash "$(dirname "$0")/eval_watch.sh" evaluation/results \
  save/rainbow/noisyqr_lr5:NoisyQrDuelingDQNAgent:NoisyQr \
  save/rainbow/qr_lr5_s1:QrDuelingDQNAgent:QrLr5S1 \
  save/rainbow/noisyc51_lr5:NoisyC51DuelingDQNAgent:NoisyC51
