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
    rows = []
    for s in STRATEGIES:
        try:
            df = pd.read_csv(f"{results_dir}/results_{s}.csv")
        except FileNotFoundError:
            continue
        rows.append({"strategy": s,
                     **{label: df[col].mean() for col, label in COLUMNS.items()
                        if col in df.columns}})
    table = pd.DataFrame(rows)
    pd.set_option("display.width", 200)
    print(table.round(2).to_string(index=False))
    return table


if __name__ == "__main__":
    main(*sys.argv[1:])
