#!/bin/bash
# Greedy rollout of a trained checkpoint (reference bin/observe.sh).
cd "$(dirname "$0")/.." || exit
python observe.py \
    -d ./save/1ramp_1x3/DuelingDoubleDQNAgent_lr0.0001_model.pack \
    -max_e 1 -log true -log_s 1 \
    "$@"
