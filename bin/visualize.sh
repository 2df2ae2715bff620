#!/bin/bash
# Training curves (reference bin/visualize.sh). Metrics are written both as
# tensorboard event files and metrics.jsonl under logs/train/.
cd "$(dirname "$0")/.." || exit
tensorboard --logdir ./logs/train/ "$@"
