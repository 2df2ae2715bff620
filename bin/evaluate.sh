#!/bin/bash
# Seeded benchmark: 50 episodes per strategy (reference bin/evaluate.sh).
cd "$(dirname "$0")/.." || exit
for s in AlwaysGreenBaseline FixedCycleBaseline AlineaDsBaseline PiAlineaDsBaseline; do
    python evaluate.py -s "$s" -n 50 --master-seed 42 "$@"
done
python evaluate.py -s DQNAgent -n 50 --master-seed 42 \
    -d ./save/1ramp_1x3/DuelingDoubleDQNAgent_lr0.0001_model.pack "$@"
