"""Evaluation parsers (reference evaluation/parsers.py semantics)."""

import numpy as np
import pytest

from multimodal_drl_rmc_tpu.evaluation import (
    get_route_type,
    parse_framework_log,
    parse_sumo_log,
    parse_tripinfo_for_episode_stats,
)

TRIPINFO = """<?xml version="1.0" encoding="UTF-8"?>
<tripinfos>
    <tripinfo id="main_con.0" duration="100.0" timeLoss="20.0" waitingTime="5.0">
        <emissions CO2_abs="1000.0" fuel_abs="4.0" NOx_abs="2.0"/>
    </tripinfo>
    <tripinfo id="main_def.0" duration="200.0" timeLoss="40.0" waitingTime="15.0" vaporized="teleport">
        <emissions CO2_abs="3000.0" fuel_abs="8.0" NOx_abs="6.0"/>
    </tripinfo>
    <tripinfo id="on_ramp_con.0" duration="60.0" timeLoss="10.0" waitingTime="2.0">
        <emissions CO2_abs="500.0" fuel_abs="2.0" NOx_abs="1.0"/>
    </tripinfo>
    <tripinfo id="off_ramp_con.0" duration="40.0" timeLoss="4.0" waitingTime="0.0">
        <emissions CO2_abs="200.0" fuel_abs="1.0" NOx_abs="0.5"/>
    </tripinfo>
</tripinfos>
"""

SUMO_LOG = """Simulation ended at time: 3600.00
Vehicles:
 Inserted: 5800 (Loaded: 6000)
Teleports: 3
Emergency Stops: 7
"""


def test_route_type_prefixes():
    assert get_route_type("main_con.3") == "Mainline"
    assert get_route_type("on_ramp_def.1") == "On-Ramp"
    assert get_route_type("off_ramp_con.9") == "Off-Ramp"
    assert get_route_type("weird.0") == "Other"


def test_tripinfo_aggregates(tmp_path):
    path = tmp_path / "tripinfo.xml"
    path.write_text(TRIPINFO)
    stats = parse_tripinfo_for_episode_stats(str(path))
    assert stats["total_throughput"] == 4
    assert stats["total_travel_time"] == pytest.approx(400.0)
    assert stats["avg_travel_time"] == pytest.approx(100.0)
    assert stats["median_travel_time"] == pytest.approx(80.0)
    assert stats["total_time_loss"] == pytest.approx(74.0)
    assert stats["sum_of_squared_time_loss"] == pytest.approx(
        20**2 + 40**2 + 10**2 + 4**2)
    assert stats["total_waiting_time"] == pytest.approx(22.0)
    assert stats["num_teleported_tripinfo"] == 1
    assert stats["total_co2_mg"] == pytest.approx(4700.0)
    assert stats["total_fuel_ml"] == pytest.approx(15.0)
    assert stats["total_nox_mg"] == pytest.approx(9.5)
    # Per-route flattened keys.
    assert stats["Mainline_throughput"] == 2
    assert stats["Mainline_avg_time_loss"] == pytest.approx(30.0)
    assert stats["On-Ramp_avg_travel_time"] == pytest.approx(60.0)
    assert stats["Off-Ramp_throughput"] == 1


def test_tripinfo_empty_and_missing(tmp_path):
    missing = parse_tripinfo_for_episode_stats(str(tmp_path / "nope.xml"))
    assert missing == {}
    empty = tmp_path / "empty.xml"
    empty.write_text("<tripinfos></tripinfos>")
    stats = parse_tripinfo_for_episode_stats(str(empty))
    assert stats["total_throughput"] == 0
    assert stats["total_co2_mg"] == 0


def test_sumo_log_regex(tmp_path):
    path = tmp_path / "sumo.log"
    path.write_text(SUMO_LOG)
    stats = parse_sumo_log(str(path))
    assert stats["demand_inserted"] == 5800
    assert stats["demand_loaded"] == 6000
    assert stats["service_rate"] == pytest.approx(5800 / 6000)
    assert stats["num_emergency_stops"] == 7
    assert parse_sumo_log(str(tmp_path / "missing.log")) == {}


def test_framework_log_averages_and_spillback(tmp_path):
    path = tmp_path / "framework.csv"
    rows = ["sim_time,ramp_queue_veh,mainline_flow_upstream_v/h"]
    # 10 cycles at 40 s; queue exceeds 20 in 3 of them.
    queues = [5, 10, 25, 30, 22, 15, 10, 5, 5, 5]
    for i, q in enumerate(queues):
        rows.append(f"{40 * (i + 1)},{q},{4000 + i}")
    path.write_text("\n".join(rows) + "\n")
    stats = parse_framework_log(str(path), spillback_threshold=20)
    assert stats["avg_ramp_queue_veh"] == pytest.approx(np.mean(queues))
    assert stats["avg_mainline_flow_upstream_v/h"] == pytest.approx(4004.5)
    assert stats["total_spillback_time_sec"] == pytest.approx(3 * 40.0)
    assert parse_framework_log(str(tmp_path / "missing.csv")) == {}
