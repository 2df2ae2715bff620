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


def seeds(results_dir: str = "evaluation/results",
          base: str = "FixedCycleBaseline") -> pd.DataFrame:
    """Multi-seed flagship robustness table (VERDICT r2 item 2): one row
    per flagship training seed (results_DQNAgentLong.csv = the original
    run, results_DQNAgentSeed<k>.csv = the re-trains), with per-seed
    evaluation means and the paired delta vs ``base``, then the
    cross-training-seed mean ± spread (min..max) — the honest form of
    the headline claim."""
    import glob
    import re

    from scipy import stats as _st

    bdf = pd.read_csv(
        os.path.join(results_dir, f"results_{base}.csv")).set_index("seed")
    runs = {}
    long_p = os.path.join(results_dir, "results_DQNAgentLong.csv")
    if os.path.isfile(long_p):
        runs["s0 (orig)"] = long_p
    for p in sorted(glob.glob(
            os.path.join(results_dir, "results_DQNAgentSeed*.csv"))):
        k = re.search(r"Seed(\d+)", p).group(1)
        runs[f"s{k}"] = p
    rows = []
    for name, p in runs.items():
        df = pd.read_csv(p).set_index("seed")
        common = df.index.intersection(bdf.index)
        d_delay = (df.loc[common, "avg_time_loss"]
                   - bdf.loc[common, "avg_time_loss"])
        d_ttt = (df.loc[common, "total_travel_time"]
                 - bdf.loc[common, "total_travel_time"])
        tcrit = float(_st.t.ppf(0.975, len(common) - 1))
        rows.append({
            "train seed": name, "episodes": len(common),
            "TTT (s)": df.loc[common, "total_travel_time"].mean(),
            "Delay (s/veh)": df.loc[common, "avg_time_loss"].mean(),
            "Spillback (s)": df.loc[common, "total_spillback_time_sec"].mean(),
            "Merge speed": df.loc[common,
                                  "avg_mainline_speed_mergeArea_km/h"].mean(),
            "Throughput": df.loc[common, "total_throughput"].mean(),
            "dDelay vs base": d_delay.mean(),
            "dDelay ±95%": tcrit * d_delay.std(ddof=1) / len(common) ** 0.5,
            "dDelay win%": 100.0 * (d_delay < 0).mean(),
            "dTTT vs base": d_ttt.mean(),
            "dTTT ±95%": tcrit * d_ttt.std(ddof=1) / len(common) ** 0.5,
        })
    t = pd.DataFrame(rows)
    if t.empty:
        print("no flagship seed results found")
        return t
    print(f"\nFlagship across training seeds (paired vs {base}, "
          "negative = better):")
    print(t.round(2).to_string(index=False))
    num = t.drop(columns=["train seed", "episodes"])
    agg = pd.DataFrame({"mean": num.mean(), "min": num.min(),
                        "max": num.max()})
    print("\nCross-seed mean and spread:")
    print(agg.round(2).to_string())
    return t


if __name__ == "__main__":
    args = [a for a in sys.argv[1:]]
    do_seeds = "--seeds" in args
    if do_seeds:
        args.remove("--seeds")
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
    if do_seeds:
        seeds(*args, base=base)
