"""Summarize a guarded/unguarded 4-protocol eval matrix.

Reads the 8 per-seed cells written by scripts/run_ms_consolidate.sh /
run_guard_loop.sh (tags <prefix>{,Hold,Noise,NoiseHold} and
<prefix>Guard{,Hold,Noise,NoiseHold}) and prints, per cell: mean
delay, worst episode, catastrophic count (>60 s/veh), and the paired
diff vs FixedCycle on the same seeds (mean ± 95% CI, episode wins).

Usage:
  python scripts/guard_matrix_table.py NoiseRobustMsS4 NoiseRobustMsS5 ...
"""

import os
import sys

import numpy as np
import pandas as pd

DIRS = {
    "clean canonical": ("evaluation/results", "", "results_FixedCycleBaseline.csv"),
    "clean held-out": ("evaluation/results_holdout", "Hold",
                       "results_FixedCycleBaseline.csv"),
    "noise canonical": ("evaluation/results_noise", "Noise",
                        "results_FixedCycleBaselineNoise01.csv"),
    "noise held-out": ("evaluation/results_holdout_noise", "NoiseHold",
                       "results_FixedCycleBaselineNoise01.csv"),
}
CAT = 60.0


def cell(path: str, fc: pd.DataFrame | None):
    t = pd.read_csv(path)
    d = t["avg_time_loss"]
    out = f"{d.mean():5.2f} / {d.max():5.1f}"
    ncat = int((d > CAT).sum())
    out += f" / {ncat}cat" if ncat else " / 0cat"
    if fc is not None:
        m = pd.merge(t[["seed", "avg_time_loss"]],
                     fc[["seed", "avg_time_loss"]], on="seed",
                     suffixes=("", "_fc"))
        diff = m["avg_time_loss"] - m["avg_time_loss_fc"]
        ci = 1.96 * diff.std(ddof=1) / np.sqrt(len(diff))
        out += f"  vsFC {diff.mean():+5.2f} ±{ci:4.2f} ({(diff < 0).sum()}/{len(diff)} wins)"
    return out


def main() -> None:
    prefixes = sys.argv[1:]
    if not prefixes:
        raise SystemExit(__doc__)
    for pre in prefixes:
        print(f"== {pre}")
        for guard in ("Guard", ""):
            label = "guarded " if guard else "unguarded"
            for proto, (d, suffix, fc_name) in DIRS.items():
                path = os.path.join(d, f"results_DQNAgent{pre}{guard}{suffix}.csv")
                if not os.path.exists(path):
                    print(f"  {label} {proto:16s}: MISSING {path}")
                    continue
                fc_path = os.path.join(d, fc_name)
                fc = pd.read_csv(fc_path) if os.path.exists(fc_path) else None
                print(f"  {label} {proto:16s}: {cell(path, fc)}")
        print()


if __name__ == "__main__":
    main()
