#!/bin/bash
# Run a classical baseline controller (reference bin/play.sh).
cd "$(dirname "$0")/.." || exit
python play.py -player AlineaDsBaseline -max_e 1 "$@"
