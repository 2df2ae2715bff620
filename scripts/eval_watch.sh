#!/bin/bash
# Unified CPU-side evaluation watcher (the single source the per-queue
# eval_*.sh scripts delegate to — four near-copies of this loop drifted
# apart during round 3, twice re-introducing a missing failure guard).
#
# For each config, once its training run is DONE: snapshot-sweep every
# step-tagged pack by 20-episode eval delay (checkpoint selection is by
# EVAL, never training reward — CLAUDE.md), then run the canonical
# 50-episode seeded evaluation of the best checkpoint under the config's
# tag. Loops until every config has its results CSV.
#
# Usage: eval_watch.sh <results_dir> <save_dir>:<algo>:<tag>[:<log_dir>] ...
#   results_dir  e.g. evaluation/results (or results_reval for diffs)
#   save_dir     training output dir containing *_model.pack + DONE
#   algo         pack algo prefix for the sweep filter (eval_snapshots)
#   tag          results CSV suffix: results_DQNAgent<tag>.csv
#   log_dir      sweep/eval logs (default: logs/<save_dir sans save/>)
#
# Guarantees the per-queue copies kept losing:
#  - transient sweep OR eval50 failure -> pending, retried next loop
#    (never a silent "DONE" with missing CSVs);
#  - the multi-minute sweep is cached in <log_dir>/sweep_summary.csv and
#    never re-run after success;
#  - idempotent across restarts/reprovisions (skips by results CSV).
cd /root/repo
export JAX_PLATFORMS='' PYTHONPATH=''
RESULTS_DIR=$1; shift
[ -n "$RESULTS_DIR" ] && [ $# -ge 1 ] || {
  echo "usage: eval_watch.sh <results_dir> <save:algo:tag[:logdir]>..." >&2
  exit 2
}
while :; do
  pending=0
  for c in "$@"; do
    IFS=: read -r d algo tag logd <<< "$c"
    [ -n "$logd" ] || logd="logs/${d#save/}"
    mkdir -p "$logd"
    [ -f "$RESULTS_DIR/results_DQNAgent$tag.csv" ] && continue
    if [ ! -f "$d/DONE" ]; then pending=1; continue; fi
    if [ ! -f "$logd/sweep_summary.csv" ]; then
      echo "=== $tag sweep $d $(date) ==="
      wd=/tmp/snapshot_eval_$tag
      python scripts/eval_snapshots.py "$d" -n 20 --algo "$algo" \
          --workdir "$wd" > "$logd/sweep.log" 2>&1 \
          || { pending=1; continue; }
      cp "$wd/summary.csv" "$logd/sweep_summary.csv"
    fi
    best=$(python - <<PY
import pandas as pd
t = pd.read_csv("$logd/sweep_summary.csv")
# Tail-guarded pick (mirrors eval_snapshots.py): best mean among snapshots
# whose worst episode is within 10 s/veh of the sweep's lowest worst —
# mean-only picks shipped catastrophic-tail agents (BENCHMARKS.md).
# Older sweep caches lack the 'worst' column; fall back to mean-only.
if "worst" in t.columns:
    t = t[t["worst"] <= t["worst"].min() + 10.0]
print(t.loc[t["delay"].idxmin(), "pack"])
PY
)
    [ -n "$best" ] || { pending=1; continue; }
    echo "=== $tag best: $best; 50-ep eval $(date) ==="
    python evaluate.py -s DQNAgent -n 50 --master-seed 42 --backend native \
        -d "$d/$best" --tag "$tag" -o "$RESULTS_DIR" \
        > "$logd/eval50.log" 2>&1 || { pending=1; continue; }
    echo "=== $tag done $(date) ==="
  done
  [ "$pending" -eq 0 ] && break
  sleep 120
done
echo "EVAL WATCH DONE ($RESULTS_DIR) $(date)"
