"""Export + plot training reward curves from metrics.jsonl streams.

Behavioral port target: reference ``evaluation/reward/reward.ipynb`` and
its exported tensorboard reward CSVs (``evaluation/reward/*.csv``) — the
artifact that documents training convergence (BASELINE.md: reward climbs
from ~-10 into the -4.5..-5.3 band over 2e6 steps). Here the runs'
always-on JSONL metric streams (runtime/metrics.py) are the source, so no
tensorboard reader is needed.

Usage:
  python evaluation/reward_curves.py [logs/train] [-o evaluation/reward]

Writes one ``<run>.csv`` (step, AvgRew, loss, epsilon) per run directory
containing a metrics.jsonl, plus ``reward_curves.png`` with every run's
AvgRew curve.
"""

from __future__ import annotations

import argparse
import json
import os


def load_run(jsonl_path: str) -> list:
    """List of segments, each ``tag -> list[(step, value)]`` in file order.

    A metrics.jsonl accumulates across restarts in the same run directory
    (runtime/metrics.py appends, like the reference's tensorboard event
    files); a step DECREASE marks a new training run, so split there
    instead of sorting runs into each other."""
    segments: list = []
    series: dict = {}
    last_step = None
    with open(jsonl_path) as f:
        for line in f:
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            if last_step is not None and rec["step"] < last_step:
                segments.append(series)
                series = {}
            last_step = rec["step"]
            series.setdefault(rec["tag"], []).append((rec["step"], rec["value"]))
    if series:
        segments.append(series)
    return segments


def find_runs(root: str) -> dict:
    runs = {}
    for dirpath, _dirs, files in os.walk(root):
        if "metrics.jsonl" in files:
            name = os.path.relpath(dirpath, root).replace(os.sep, "__")
            runs[name] = os.path.join(dirpath, "metrics.jsonl")
    return runs


def export_csv(series: dict, out_csv: str) -> int:
    tags = [t for t in ("AvgRew", "loss", "epsilon", "cycle_reward",
                        "env_steps_per_sec") if t in series]
    if "AvgRew" not in series:
        return 0
    by_step: dict = {}
    for tag in tags:
        for step, val in series[tag]:
            by_step.setdefault(step, {})[tag] = val
    with open(out_csv, "w") as f:
        f.write("step," + ",".join(tags) + "\n")
        for step in sorted(by_step):
            row = by_step[step]
            f.write(str(step) + "," +
                    ",".join(f"{row.get(t, '')}" for t in tags) + "\n")
    return len(by_step)


def plot(all_series: dict, out_png: str) -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(9, 5))
    for name, series in sorted(all_series.items()):
        if "AvgRew" not in series:
            continue
        steps, vals = zip(*series["AvgRew"])
        ax.plot(steps, vals, label=name, linewidth=1.2)
    ax.set_xlabel("environment steps")
    ax.set_ylabel("AvgRew (episode-return running mean)")
    ax.set_title("Training reward curves")
    ax.legend(fontsize=7, loc="lower right")
    ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(out_png, dpi=130)
    print(f"plot -> {out_png}")


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("log_root", nargs="?", default="logs/train")
    p.add_argument("-o", "--output-dir", default="evaluation/reward")
    args = p.parse_args(argv)

    os.makedirs(args.output_dir, exist_ok=True)
    all_series = {}
    for name, path in find_runs(args.log_root).items():
        segments = load_run(path)
        for i, series in enumerate(segments):
            # Latest segment keeps the bare run name; earlier substantial
            # restarts are suffixed; short debug segments are dropped.
            if i < len(segments) - 1 and len(series.get("AvgRew", ())) < 20:
                continue
            seg_name = name if i == len(segments) - 1 else f"{name}__run{i}"
            n = export_csv(series, os.path.join(args.output_dir, f"{seg_name}.csv"))
            if n and i == len(segments) - 1:
                all_series[seg_name] = series
                print(f"{seg_name}: {n} points -> {seg_name}.csv")
    if all_series:
        plot(all_series, os.path.join(args.output_dir, "reward_curves.png"))
    else:
        print("no runs with AvgRew found under", args.log_root)


if __name__ == "__main__":
    main()
