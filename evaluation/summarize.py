"""Cross-strategy summary table from results_<Strategy>.csv files.

Usage: python evaluation/summarize.py [results_dir]
Prints the BASELINE.md-style comparison (means over episodes).
"""

from __future__ import annotations

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


if __name__ == "__main__":
    main(*sys.argv[1:])
