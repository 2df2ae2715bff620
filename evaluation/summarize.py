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
        d = df["avg_time_loss"]
        k = max(1, len(d) // 10)
        # Tail columns (worst episode / CVaR@10 = mean of worst decile):
        # the held-out study showed mean-selected agents hiding 87-106
        # s/veh catastrophic episodes — a deploy decision needs the tail.
        rows.append({"strategy": s, "episodes": len(df),
                     **{label: df[col].mean() for col, label in COLUMNS.items()
                        if col in df.columns},
                     "Worst delay": d.max(),
                     "CVaR@10 delay": d.nlargest(k).mean()})
    table = pd.DataFrame(rows)
    pd.set_option("display.width", 220)
    print(table.round(2).to_string(index=False))
    return table


def _paired_deltas(df: pd.DataFrame, bdf: pd.DataFrame, col: str):
    """(mean, t-CI half-width, win%) of per-seed ``df-bdf`` deltas on the
    common eval seeds, or None when fewer than 2 seeds overlap. Student-t
    critical value, not 1.96: at typical n=20-50 episodes the normal value
    is anti-conservative for a paired CI (ADVICE r2)."""
    from scipy import stats as _st

    common = df.index.intersection(bdf.index)
    if len(common) < 2:
        return None
    d = df.loc[common, col] - bdf.loc[common, col]
    tcrit = float(_st.t.ppf(0.975, len(common) - 1))
    sem = d.std(ddof=1) / len(d) ** 0.5
    return d.mean(), tcrit * sem, 100.0 * (d < 0).mean()


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
        stats3 = {label: _paired_deltas(df, bdf, col)
                  for col, label in (("total_travel_time", "dTTT"),
                                     ("avg_time_loss", "dDelay"))}
        if any(v is None for v in stats3.values()):
            continue
        row = {"strategy": s,
               "n": len(df.index.intersection(bdf.index))}
        for label, (mean, ci, win) in stats3.items():
            row[f"{label} mean"] = mean
            row[f"{label} ±95%"] = ci
            row[f"{label} win%"] = win
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

    base_p = os.path.join(results_dir, f"results_{base}.csv")
    if not os.path.isfile(base_p):
        raise SystemExit(f"no results for base strategy {base}")
    bdf = pd.read_csv(base_p).set_index("seed")
    runs = {}
    long_p = os.path.join(results_dir, "results_DQNAgentLong.csv")
    if os.path.isfile(long_p):
        runs["s0 (orig)"] = long_p
    # Flagship re-train rows ONLY: the stem must be exactly
    # DQNAgentSeed<k> — tagged ablations like DQNAgentSeed2Pen50 must not
    # glob-collide with (and silently overwrite) the real seed rows.
    matches = []
    for p in glob.glob(os.path.join(results_dir,
                                    "results_DQNAgentSeed*.csv")):
        m = re.fullmatch(r"results_DQNAgentSeed(\d+)\.csv",
                         os.path.basename(p))
        if m:
            matches.append((int(m.group(1)), p))
    for k, p in sorted(matches):
        runs[f"s{k}"] = p
    rows = []
    for name, p in runs.items():
        df = pd.read_csv(p).set_index("seed")
        common = df.index.intersection(bdf.index)
        delay = _paired_deltas(df, bdf, "avg_time_loss")
        ttt = _paired_deltas(df, bdf, "total_travel_time")
        if delay is None or ttt is None:
            print(f"skipping {name}: <2 eval seeds in common with {base}")
            continue
        rows.append({
            "train seed": name, "episodes": len(common),
            "TTT (s)": df.loc[common, "total_travel_time"].mean(),
            "Delay (s/veh)": df.loc[common, "avg_time_loss"].mean(),
            "Worst delay": df.loc[common, "avg_time_loss"].max(),
            "Spillback (s)": df.loc[common, "total_spillback_time_sec"].mean(),
            "Merge speed": df.loc[common,
                                  "avg_mainline_speed_mergeArea_km/h"].mean(),
            "Throughput": df.loc[common, "total_throughput"].mean(),
            "dDelay vs base": delay[0], "dDelay ±95%": delay[1],
            "dDelay win%": delay[2],
            "dTTT vs base": ttt[0], "dTTT ±95%": ttt[1],
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
