#!/usr/bin/env bash
# Partial-detection logging rollout (reference bin/log/log_def.sh role):
# same as log_full.sh with the CV penetration frozen low via the
# evaluation harness instead of a separate scenario copy.
MAX_E="${MAX_E:-50}"
python3 evaluate.py -s DQNAgent -n "$MAX_E" --backend auto \
    -d save/1ramp_1x3/PerDuelingDoubleDQNAgent_lr0.0001_model.pack \
    --pen-rate 0.1 --tag Pen10 -o ./logs/test/
