#!/bin/bash
# Screen v2 held-out window (scripts/early_screen.py module docstring):
# after a seed screens POSITIVE (any <=500k snapshot with 20-episode
# sweep delay < 30), run 20 extra episodes on the held-out seed stream
# (142+) at the SCREEN snapshot to tier the positive:
#   clean-positive (0 episodes > 60 s/veh) -> continue with priority
#     (retro-validation: 4/4 reached the ~29 tier)
#   razor-positive (any catastrophic episode) -> continue only when
#     chip budget allows (1/4 reached the tier), and gate the final
#     pick on the full 50-episode held-out protocol before deploy.
# Usage: scripts/screen_holdout.sh <screen_snapshot.pack> <Tag>
set -e
cd "$(dirname "$0")/.." || exit 1
pack=$1 tag=$2
[ -f "$pack" ] || { echo "no such pack: $pack"; exit 1; }
out=evaluation/results_screen_holdout
mkdir -p "$out" logs
JAX_PLATFORMS='' PYTHONPATH='' python evaluate.py -s DQNAgent -n 20 \
  --backend native -d "$pack" --tag "Screen$tag" -o "$out" \
  --master-seed 142 > "logs/eval_screen_Screen$tag.log" 2>&1
python - "$out/results_DQNAgentScreen$tag.csv" <<'PY'
import csv, sys
vals = [float(r["avg_time_loss"]) for r in csv.DictReader(open(sys.argv[1]))]
cat = sum(1 for v in vals if v > 60.0)
mean = sum(vals) / len(vals)
tier = "clean" if cat == 0 else "razor"
print(f"held-out screen window: mean {mean:.2f} worst {max(vals):.2f} "
      f"cat {cat} -> {tier}-positive")
PY
