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


def load_run(jsonl_path: str) -> dict:
    """tag -> list[(step, value)], step-sorted."""
    series: dict = {}
    with open(jsonl_path) as f:
        for line in f:
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            series.setdefault(rec["tag"], []).append((rec["step"], rec["value"]))
    for tag in series:
        series[tag].sort()
    return series


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
        series = load_run(path)
        n = export_csv(series, os.path.join(args.output_dir, f"{name}.csv"))
        if n:
            all_series[name] = series
            print(f"{name}: {n} points -> {name}.csv")
    if all_series:
        plot(all_series, os.path.join(args.output_dir, "reward_curves.png"))
    else:
        print("no runs with AvgRew found under", args.log_root)


if __name__ == "__main__":
    main()
