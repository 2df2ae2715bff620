#!/bin/bash
# Canonical training invocation (reference bin/train.sh: DuelingDoubleDQN,
# 2.1M steps). -backend device = fused on-TPU sim+learner; use
# -backend native for the host C++ microsim actor loop, -backend sumo
# for SUMO/TraCI when installed.
cd "$(dirname "$0")/.." || exit
python train.py \
    -algo DuelingDoubleDQNAgent \
    -backend device \
    -n_env 256 \
    -max_total_steps 2100000 \
    "$@"
