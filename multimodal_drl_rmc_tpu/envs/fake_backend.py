"""Scripted traffic backend for tests and SUMO-free development.

The reference has no test suite and no sim stand-in at all (SURVEY.md §4);
every behavior is only observable through a live SUMO process. This backend
implements the full ``TrafficBackend`` protocol with a small deterministic
macroscopic model, so the MDP cycle logic, reward, grid builder, baselines,
wrappers, and drivers are all unit-testable in milliseconds.

Model (per sim step, default 1 s):
  * ramp queue: arrivals at the drawn ramp demand; discharges at the
    saturation rate (0.5 veh/s, the ALINEA constant, baselines.py:141)
    while the meter shows green;
  * merge flow = mainline flow + ramp discharge; congestion index
    c = merge flow / merge capacity drives bottleneck occupancy and speed;
  * upstream occupancy/speed degrade when the bottleneck saturates
    (a crude backpressure term);
  * detectors integrate these flows with Bresenham-style integer emission,
    snapshotting at every detector period like SUMO's E1 loops.

Everything is a pure function of (seed, phase sequence), making tests
reproducible.
"""

from __future__ import annotations

import random
from typing import Dict

import numpy as np

from ..config import ScenarioConfig
from .backend import (
    GREEN_PHASE,
    DemandDraw,
    TrafficBackend,
    VehicleSnapshot,
    draw_demand,
)
from .scenario import RAMP_1X3, ScenarioSpec

RAMP_SATURATION_VPS = 0.5
VEH_SPACING_M = 7.5      # 5 m vehicle + 2.5 m min gap


class _Loop:
    """One induction loop: integer vehicle emission + interval aggregation."""

    __slots__ = (
        "carry", "interval_count", "last_interval_count",
        "occ_sum", "occ_steps", "last_interval_occ",
        "step_count", "step_speed",
    )

    def __init__(self):
        self.carry = 0.0
        self.interval_count = 0
        self.last_interval_count = 0
        self.occ_sum = 0.0
        self.occ_steps = 0
        self.last_interval_occ = 0.0
        self.step_count = 0
        self.step_speed = -1.0

    def push(self, flow_vps: float, dt: float, occ_percent: float, speed_mps: float):
        self.carry += flow_vps * dt
        n = int(self.carry)
        self.carry -= n
        self.step_count = n
        self.step_speed = speed_mps if n > 0 else -1.0
        self.interval_count += n
        self.occ_sum += occ_percent
        self.occ_steps += 1

    def snapshot(self):
        self.last_interval_count = self.interval_count
        self.last_interval_occ = (
            self.occ_sum / self.occ_steps if self.occ_steps else 0.0
        )
        self.interval_count = 0
        self.occ_sum = 0.0
        self.occ_steps = 0


class FakeTrafficBackend(TrafficBackend):
    def __init__(
        self,
        scenario_cfg: ScenarioConfig | None = None,
        spec: ScenarioSpec = RAMP_1X3,
        detector_period_s: float = 40.0,
    ):
        self.cfg = scenario_cfg or ScenarioConfig()
        self.spec = spec
        self.sim_step_seconds = self.cfg.sim_step_seconds
        self.detector_period_s = detector_period_s
        self._loops: Dict[str, _Loop] = {}
        self._ep_count = 0
        self.reset(seed=0)

    # -- lifecycle ---------------------------------------------------------
    def reset(self, seed: int | None = None) -> None:
        if seed is None:
            seed = self._ep_count
        self._rng = np.random.default_rng(seed)
        self.demand: DemandDraw = draw_demand(self.cfg, random.Random(seed))
        self._ep_count += 1
        self._t = 0.0
        self._phase = GREEN_PHASE
        self._queue = 0.0
        self._queue_carry = 0.0
        self._departed = 0
        self._arrived = 0
        self._loops = {l.id: _Loop() for l in self.spec.loops}
        # dynamic state used by the snapshot builder
        self._bottleneck_speed = self.spec.edge("acceleration_area").speed_mps
        self._upstream_speed = self.spec.edge("main_road").speed_mps
        self._last_discharge_vps = 0.0
        self._delay_accum_s = 0.0
        self._waiting_accum_s = 0.0

    def step(self) -> None:
        dt = self.sim_step_seconds
        cfg = self.cfg
        main_vps = self.demand.main_flow_vph / 3600.0
        ramp_vps = self.demand.on_ramp_flow_vph / 3600.0

        # Ramp queue dynamics.
        self._queue += ramp_vps * dt
        discharge = 0.0
        if self._phase == GREEN_PHASE:
            discharge = min(self._queue, RAMP_SATURATION_VPS * dt)
            self._queue -= discharge
        self._last_discharge_vps = discharge / dt

        # Congestion model.
        merge_vps = main_vps + self._last_discharge_vps
        merge_capacity_vps = 4 * 1900.0 / 3600.0
        c = merge_vps / merge_capacity_vps
        excess = max(0.0, c - 0.5) / 0.5
        bn_occ = min(100.0, 100.0 * 0.35 * c + 40.0 * excess)
        bn_speed = max(2.0, self.spec.edge("acceleration_area").speed_mps * (1.0 - 0.75 * min(1.0, excess)))
        up_capacity_vps = 3 * 1900.0 / 3600.0
        cu = main_vps / up_capacity_vps
        backpressure = 0.5 * max(0.0, bn_occ - 60.0) / 40.0
        up_occ = min(100.0, 100.0 * 0.30 * cu + 30.0 * backpressure)
        up_speed = max(2.0, self.spec.edge("main_road").speed_mps * (1.0 - 0.5 * backpressure))
        out_vps = merge_vps * (1.0 - 0.3 * max(0.0, c - 1.0))
        out_speed = max(4.0, self.spec.edge("end_main_road").speed_mps * (1.0 - 0.4 * min(1.0, excess)))
        self._bottleneck_speed = bn_speed
        self._upstream_speed = up_speed

        # Feed detectors.
        per_lane_main = main_vps / 3.0
        for sens in ("up_stream_sens_0", "up_stream_sens_1", "up_stream_sens_2",
                     "up_stream_sens_00", "up_stream_sens_11", "up_stream_sens_22"):
            self._loops[sens].push(per_lane_main, dt, up_occ, up_speed)
        # Accel-area lane 0 carries the ramp discharge; lanes 1-3 the mainline.
        self._loops["bottle_neck_sens_0"].push(self._last_discharge_vps, dt, bn_occ, bn_speed)
        self._loops["merge_start_sens"].push(self._last_discharge_vps, dt, bn_occ, bn_speed)
        for sens in ("bottle_neck_sens_1", "bottle_neck_sens_2", "bottle_neck_sens_3"):
            self._loops[sens].push(per_lane_main, dt, bn_occ, bn_speed)
        per_lane_out = out_vps / 3.0
        for sens in ("outflow_sens_0", "outflow_sens_1", "outflow_sens_2"):
            self._loops[sens].push(per_lane_out, dt, 0.3 * bn_occ, out_speed)
        ramp_occ = min(100.0, 100.0 * self._queue * VEH_SPACING_M
                       / self.spec.edge("on_ramp").length_m)
        self._loops["queue_sens"].push(ramp_vps, dt, ramp_occ, 5.0)
        self._loops["demand_sens_0"].push(self._last_discharge_vps, dt, ramp_occ, 6.0)
        self._loops["passage_sens"].push(self._last_discharge_vps, dt, 0.0, 10.0)
        self._loops["passage_queue_sens"].push(self._last_discharge_vps, dt, 0.0, 10.0)

        self._departed += (main_vps + ramp_vps) * dt
        self._arrived += out_vps * dt
        # Aggregate delay proxy: mainline vehicles losing speed + queued
        # ramp vehicles each losing a full second per second.
        n_main = (main_vps * self.spec.edge("main_road").length_m
                  / max(self._upstream_speed, 1.0))
        freeflow = self.spec.edge("main_road").speed_mps
        self._delay_accum_s += dt * (
            n_main * (1.0 - self._upstream_speed / freeflow) + self._queue
        )
        self._waiting_accum_s += dt * self._queue
        self._t += dt
        if self._t % self.detector_period_s < dt / 2 or \
           self.detector_period_s - (self._t % self.detector_period_s) < dt / 2:
            for loop in self._loops.values():
                loop.snapshot()

    # -- time / termination ------------------------------------------------
    def time(self) -> float:
        return self._t

    def is_end(self) -> bool:
        return self._t >= self.cfg.episode_seconds + 1e-6

    # -- traffic light -----------------------------------------------------
    def set_phase(self, phase_index: int) -> None:
        self._phase = phase_index

    def get_phase(self) -> int:
        return self._phase

    # -- detectors ---------------------------------------------------------
    def interval_vehicle_count(self, loop_id: str) -> int:
        return self._loops[loop_id].last_interval_count

    def interval_occupancy(self, loop_id: str) -> float:
        return self._loops[loop_id].last_interval_occ

    def last_step_vehicle_count(self, loop_id: str) -> int:
        return self._loops[loop_id].step_count

    def last_step_mean_speed(self, loop_id: str) -> float:
        return self._loops[loop_id].step_speed

    # -- edges -------------------------------------------------------------
    def edge_vehicle_count(self, edge_id: str) -> int:
        if edge_id == self.spec.on_ramp_edge:
            return int(self._queue)
        if edge_id == self.spec.upstream_edge:
            spec = self.spec.edge(edge_id)
            density = (self.demand.main_flow_vph / 3600.0) / max(self._upstream_speed, 1.0)
            return int(density * spec.length_m)
        return 0

    # -- vehicles ----------------------------------------------------------
    def vehicle_snapshot(self) -> VehicleSnapshot:
        lane_ids = []
        pos = []
        speed = []
        con = []
        rng = np.random.default_rng(int(self._t) * 7919 + 13)
        # Queued ramp vehicles stack back from the stop line.
        ramp_len = self.spec.edge("on_ramp").length_m
        n_queue = int(self._queue)
        for i in range(n_queue):
            p = ramp_len - 1.0 - i * VEH_SPACING_M
            if p < 0:
                break
            lane_ids.append("on_ramp_0")
            pos.append(p)
            speed.append(0.0)
            con.append(rng.random() < self.demand.pen_rate)
        # Mainline vehicles spread over the last stretch of main_road.
        main = self.spec.edge("main_road")
        density_per_lane = (self.demand.main_flow_vph / 3600.0 / 3.0) / max(self._upstream_speed, 1.0)
        per_lane = int(density_per_lane * main.length_m)
        for lane in range(3):
            for _ in range(per_lane):
                lane_ids.append(f"main_road_{lane}")
                pos.append(float(rng.uniform(0.0, main.length_m)))
                speed.append(float(max(0.0, rng.normal(self._upstream_speed, 2.0))))
                con.append(rng.random() < self.demand.pen_rate)
        return VehicleSnapshot(
            lane_ids=lane_ids,
            lane_pos=np.asarray(pos, np.float32),
            speed=np.asarray(speed, np.float32),
            is_connected=np.asarray(con, bool),
        )

    # -- metadata ----------------------------------------------------------
    def scenario_info(self) -> dict:
        return self.demand.scenario_info()

    def sim_stats(self) -> dict:
        return {
            "total_running_vehicles": int(self._departed - self._arrived),
            "total_departed": int(self._departed),
            "total_arrived": int(self._arrived),
        }

    def episode_artifacts(self) -> dict:
        """Coarse tripinfo-equivalent aggregates so the evaluation harness
        produces schema-complete rows without SUMO (real fidelity comes from
        the native / SUMO backends)."""
        arrived = max(1.0, self._arrived)
        freeflow_tt = sum(
            self.spec.edge(e).length_m / self.spec.edge(e).speed_mps
            for e in ("entry", "off_ramp_up_stream", "main_road",
                      "acceleration_area", "end_main_road")
        )
        total_tt = arrived * freeflow_tt + self._delay_accum_s
        trip_stats = {
            "total_throughput": int(self._arrived),
            "total_travel_time": total_tt,
            "avg_travel_time": total_tt / arrived,
            "total_time_loss": self._delay_accum_s,
            "avg_time_loss": self._delay_accum_s / arrived,
            "total_waiting_time": self._waiting_accum_s,
            "avg_waiting_time": self._waiting_accum_s / arrived,
            "num_teleported_tripinfo": 0,
            # ~3.6 g CO2 per vehicle-second, the order the reference's HBEFA
            # totals imply (BASELINE.md: ~2e9 mg over ~5.5e5 veh-s).
            "total_co2_mg": total_tt * 3600.0,
            "total_fuel_ml": total_tt * 1.5,
            "total_nox_mg": total_tt * 1.6,
        }
        loaded = max(1, int(self._departed))
        return {
            "trip_stats": trip_stats,
            "sim_log_stats": {
                "demand_loaded": loaded,
                "demand_inserted": int(self._departed),
                "service_rate": 1.0,
                "num_emergency_stops": 0,
            },
        }
