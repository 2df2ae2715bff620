"""Cross-strategy summary table from results_<Strategy>.csv files.

Usage: python evaluation/summarize.py [results_dir] [--paired [BASE]]
Prints the BASELINE.md-style comparison (means over episodes). With
--paired, adds per-seed paired differences vs BASE (default
FixedCycleBaseline): evaluate.py gives every strategy the same per-episode
demand draws (seed = master+i, reference evaluate.py:56-59), so paired
stats cancel the demand variance that dominates raw episode spread.
"""

from __future__ import annotations

import os
import sys

import pandas as pd

STRATEGIES = (
    "AlwaysGreenBaseline", "FixedCycleBaseline", "AlineaDsBaseline",
    "PiAlineaDsBaseline", "DQNAgent",
)

COLUMNS = {
    "total_travel_time": "TTT (s)",
    "avg_time_loss": "Avg delay (s/veh)",
    "total_spillback_time_sec": "Spillback (s)",
    "avg_ramp_queue_veh": "Ramp queue (veh)",
    "avg_mainline_speed_mergeArea_km/h": "Merge speed (m/s)",
    "avg_mainline_occ_mergeArea_percent": "Merge occ (%)",
    "total_co2_mg": "CO2 (mg)",
    "total_throughput": "Throughput (veh)",
    "service_rate": "Service rate",
}


def main(results_dir: str = "evaluation/results") -> pd.DataFrame:
    import glob
    import os

    # Canonical strategies first, then any extra (tagged/ablation) rows.
    found = {os.path.basename(p)[len("results_"):-len(".csv")]: p
             for p in glob.glob(f"{results_dir}/results_*.csv")}
    ordered = [s for s in STRATEGIES if s in found]
    ordered += sorted(s for s in found if s not in STRATEGIES)

    rows = []
    for s in ordered:
        df = pd.read_csv(found[s])
        rows.append({"strategy": s, "episodes": len(df),
                     **{label: df[col].mean() for col, label in COLUMNS.items()
                        if col in df.columns}})
    table = pd.DataFrame(rows)
    pd.set_option("display.width", 220)
    print(table.round(2).to_string(index=False))
    return table


def paired(results_dir: str = "evaluation/results",
           base: str = "FixedCycleBaseline") -> pd.DataFrame:
    """Per-seed paired differences vs ``base`` (negative = better than base
    on TTT/delay). mean ± t(.975, n-1)·sem over the common seeds + win rate."""
    import glob
    import os

    found = {os.path.basename(p)[len("results_"):-len(".csv")]: p
             for p in glob.glob(f"{results_dir}/results_*.csv")}
    if base not in found:
        raise SystemExit(f"no results for base strategy {base}")
    bdf = pd.read_csv(found[base]).set_index("seed")
    rows = []
    for s, path in sorted(found.items()):
        if s == base:
            continue
        df = pd.read_csv(path).set_index("seed")
        common = df.index.intersection(bdf.index)
        if len(common) < 2:
            continue
        row = {"strategy": s, "n": len(common)}
        # Student-t critical value, not 1.96: at typical n=20-50 episodes
        # the normal value is anti-conservative for a paired CI.
        from scipy import stats as _st
        tcrit = float(_st.t.ppf(0.975, len(common) - 1))
        for col, label in (("total_travel_time", "dTTT"),
                           ("avg_time_loss", "dDelay")):
            d = df.loc[common, col] - bdf.loc[common, col]
            sem = d.std(ddof=1) / len(d) ** 0.5
            row[f"{label} mean"] = d.mean()
            row[f"{label} ±95%"] = tcrit * sem
            row[f"{label} win%"] = 100.0 * (d < 0).mean()
        rows.append(row)
    table = pd.DataFrame(rows)
    print(f"\nPaired per-seed differences vs {base} "
          f"(negative = better than {base}):")
    print(table.round(2).to_string(index=False))
    return table


if __name__ == "__main__":
    args = [a for a in sys.argv[1:]]
    do_paired = "--paired" in args
    base = "FixedCycleBaseline"
    if do_paired:
        i = args.index("--paired")
        args.pop(i)
        # A value right after --paired is the base STRATEGY only if it looks
        # like one (a results_<name>.csv stem, not a directory path).
        if i < len(args) and not args[i].startswith("-") \
                and "/" not in args[i] and not os.path.isdir(args[i]):
            base = args.pop(i)
    main(*args)
    if do_paired:
        paired(*args, base=base)
