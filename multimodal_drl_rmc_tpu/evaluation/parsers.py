"""Episode-artifact parsers for the evaluation harness.

Behavioral port target: reference ``evaluation/parsers.py`` — the three
sources merged into one row per evaluated episode:

  * ``parse_tripinfo_for_episode_stats`` (:21-102): SUMO tripinfo XML with
    per-trip emissions -> throughput / total+avg travel time / time loss /
    waiting / teleports / CO2 / fuel / NOx + per-route aggregates
    (Mainline / On-Ramp / Off-Ramp by trip-id prefix);
  * ``parse_sumo_log`` (:105-120): SUMO run log regex -> demand loaded /
    inserted / service rate / emergency stops;
  * ``parse_framework_log`` (:123-170): the per-cycle CSV written by
    ``GymEnvWrapper.log_info_writer`` -> episode-average detector metrics +
    total spillback time (steps with queue > threshold x median step dt).

Output key names match the reference exactly so ``results_<Strategy>.csv``
files are schema-compatible with the checked-in baselines
(BASELINE.md table)."""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET

import numpy as np
import pandas as pd

ROUTE_TYPES = ("Mainline", "On-Ramp", "Off-Ramp")


def get_route_type(trip_id: str) -> str:
    """Trip-id prefix -> route class (reference parsers.py:8-18).

    Order matters: 'on_ramp'/'off_ramp' ids also contain no 'main', but the
    reference checks 'main' first — an id like 'main_con.3' is Mainline."""
    if "main" in trip_id:
        return "Mainline"
    if "on_ramp" in trip_id:
        return "On-Ramp"
    if "off_ramp" in trip_id:
        return "Off-Ramp"
    return "Other"


_ZERO_TRIP_STATS = {
    "total_throughput": 0, "total_travel_time": 0, "avg_travel_time": 0,
    "median_travel_time": 0, "std_dev_travel_time": 0,
    "total_time_loss": 0, "avg_time_loss": 0, "median_time_loss": 0,
    "std_dev_time_loss": 0, "sum_of_squared_time_loss": 0,
    "total_waiting_time": 0, "avg_waiting_time": 0,
    "num_teleported_tripinfo": 0,
    "total_co2_mg": 0, "total_fuel_ml": 0, "total_nox_mg": 0,
}


def parse_tripinfo_for_episode_stats(tripinfo_path: str) -> dict:
    """Aggregate one episode's tripinfo XML (reference parsers.py:21-102)."""
    try:
        root = ET.parse(tripinfo_path).getroot()
    except (FileNotFoundError, ET.ParseError):
        return {}

    rows = []
    for trip in root.findall("tripinfo"):
        if not trip.get("duration"):
            continue
        attrs = dict(trip.attrib)
        attrs["route_type"] = get_route_type(attrs.get("id", ""))
        emissions = trip.find("emissions")
        if emissions is not None:
            attrs.update(emissions.attrib)
        for key, val in list(attrs.items()):
            try:
                attrs[key] = float(val)
            except (TypeError, ValueError):
                pass
        attrs["vaporized"] = 1 if "vaporized" in trip.keys() else 0
        rows.append(attrs)

    if not rows:
        return dict(_ZERO_TRIP_STATS)

    df = pd.DataFrame(rows).fillna(0)
    for col in ("duration", "timeLoss", "waitingTime", "CO2_abs", "fuel_abs", "NOx_abs"):
        if col not in df.columns:
            df[col] = 0.0

    stats = {
        "total_throughput": len(df),
        "total_travel_time": df["duration"].sum(),
        "avg_travel_time": df["duration"].mean(),
        "median_travel_time": df["duration"].median(),
        "std_dev_travel_time": df["duration"].std(),
        "total_time_loss": df["timeLoss"].sum(),
        "avg_time_loss": df["timeLoss"].mean(),
        "median_time_loss": df["timeLoss"].median(),
        "std_dev_time_loss": df["timeLoss"].std(),
        "sum_of_squared_time_loss": (df["timeLoss"] ** 2).sum(),
        "total_waiting_time": df["waitingTime"].sum(),
        "avg_waiting_time": df["waitingTime"].mean(),
        "num_teleported_tripinfo": df["vaporized"].sum(),
        "total_co2_mg": df["CO2_abs"].sum(),
        "total_fuel_ml": df["fuel_abs"].sum(),
        "total_nox_mg": df["NOx_abs"].sum(),
    }

    # Per-route aggregates flattened to '<Route>_<metric>' keys
    # (reference parsers.py:92-102 unstack naming).
    for route in ROUTE_TYPES:
        sub = df[df["route_type"] == route]
        stats[f"{route}_avg_time_loss"] = sub["timeLoss"].mean() if len(sub) else np.nan
        stats[f"{route}_avg_travel_time"] = sub["duration"].mean() if len(sub) else np.nan
        stats[f"{route}_throughput"] = len(sub)
    return stats


def parse_sumo_log(log_path: str) -> dict:
    """SUMO run-log regex scrape (reference parsers.py:105-120)."""
    try:
        with open(log_path) as f:
            content = f.read()
    except FileNotFoundError:
        return {}
    inserted = re.search(r"Vehicles:\s*\n\s*Inserted:\s*(\d+)\s*\(Loaded:\s*(\d+)\)", content)
    stops = re.search(r"Emergency Stops:\s*(\d+)", content)
    demand_inserted = int(inserted.group(1)) if inserted else 0
    demand_loaded = int(inserted.group(2)) if inserted else 0
    return {
        "demand_loaded": demand_loaded,
        "demand_inserted": demand_inserted,
        "service_rate": demand_inserted / demand_loaded if demand_loaded > 0 else 0,
        "num_emergency_stops": int(stops.group(1)) if stops else 0,
    }


AVG_METRIC_COLS = (
    "mainline_flow_upstream_v/h", "mainline_occ_upstream_percent",
    "mainline_speed_upstream_km/h", "mainline_flow_mergeArea_v/h",
    "mainline_occ_mergeArea_percent", "mainline_speed_mergeArea_km/h",
    "mainline_flow_downstream_v/h", "mainline_occ_downstream_percent",
    "mainline_speed_downstream_km/h", "ramp_queue_veh",
)


def parse_framework_log(log_path: str, spillback_threshold: float = 20) -> dict:
    """Per-cycle CSV -> episode averages + spillback time
    (reference parsers.py:123-170)."""
    try:
        df = pd.read_csv(log_path)
    except (FileNotFoundError, pd.errors.EmptyDataError):
        return {}
    if df.empty:
        return {}

    out = {f"avg_{c}": df[c].mean() for c in AVG_METRIC_COLS if c in df.columns}

    spillback_time = 0.0
    if "ramp_queue_veh" in df.columns and "sim_time" in df.columns:
        over = df[df["ramp_queue_veh"] > spillback_threshold]
        if len(over):
            dt = df["sim_time"].diff().median()
            if pd.notna(dt) and dt > 0:
                spillback_time = len(over) * float(dt)
    out["total_spillback_time_sec"] = spillback_time
    return out
