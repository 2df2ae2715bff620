#!/usr/bin/env bash
# Per-step CSV logging rollout of the flagship pack (reference
# bin/log/log_con.sh role): greedy episodes with the full info-dict
# written to logs/test/<pack>/.
MAX_E="${MAX_E:-50}"
SAVE="${SAVE:-1ramp_1x3}"
python3 observe.py -d "save/$SAVE/PerDuelingDoubleDQNAgent_lr0.0001_model.pack" \
    -max_e "$MAX_E" -log y -log_s 1 -log_dir ./logs/test/
