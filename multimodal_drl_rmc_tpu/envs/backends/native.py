"""Native C++ microsim backend (ctypes bridge to csrc/trafficsim.cc).

Implements the full ``TrafficBackend`` protocol in-process: detector
interval/last-step reads, TL phase control, ramp-queue counts, and the
connected-vehicle snapshot (chain coordinates mapped back to SUMO-style
lane ids so the shared grid builder, envs/grid.py, works unchanged).

This replaces the reference's per-step TraCI socket round-trips
(sumo_env.py:346-520) with direct function calls into the same process;
all calls release the GIL, so ThreadVecEnv scales across cores.
"""

from __future__ import annotations

import ctypes
import random

import numpy as np

from ...config import ScenarioConfig
from ...runtime.native_build import load
from ...sim.geometry import GEO, build_geometry
from ..backend import DemandDraw, TrafficBackend, VehicleSnapshot, draw_demand
from ..scenario import RAMP_1X3, ScenarioSpec

_MAX_SEGS = 5
_SNAP_CAP = 4096


class NativeSimBackend(TrafficBackend):
    def __init__(self, scenario_cfg: ScenarioConfig | None = None,
                 spec: ScenarioSpec = RAMP_1X3, detector_period_s: float = 40.0):
        self.cfg = scenario_cfg or ScenarioConfig()
        self.spec = spec
        self.sim_step_seconds = 1.0
        self._lib = load()
        geo = GEO if spec is RAMP_1X3 else build_geometry(spec)
        self._geo = geo
        self._loop_index = {n: i for i, n in enumerate(geo.loop_names)}
        self._mirror = {}
        for name, idx in self._loop_index.items():
            if name.endswith("@ramp"):
                self._mirror.setdefault(name.split("@")[0], []).append(idx)

        n_chains = len(geo.chain_length)
        seg_end = np.where(np.isfinite(geo.seg_end), geo.seg_end, 1e18)
        n_segs = np.sum(np.isfinite(geo.seg_end), axis=1).astype(np.int32)
        stop = np.where(np.isfinite(geo.stop_line), geo.stop_line, 1e18)

        def dp(a):
            return np.ascontiguousarray(a, np.float64).ctypes.data_as(
                ctypes.POINTER(ctypes.c_double))

        def ip(a):
            return np.ascontiguousarray(a, np.int32).ctypes.data_as(
                ctypes.POINTER(ctypes.c_int))

        # Keep the arrays alive for the duration of the ctypes call.
        arrs = [np.ascontiguousarray(geo.chain_length, np.float64),
                np.ascontiguousarray(n_segs, np.int32),
                np.ascontiguousarray(seg_end, np.float64),
                np.ascontiguousarray(geo.seg_speed, np.float64),
                np.ascontiguousarray(stop, np.float64),
                np.ascontiguousarray(geo.loop_chain, np.int32),
                np.ascontiguousarray(geo.loop_pos, np.float64),
                np.ascontiguousarray(geo.freeflow_tt, np.float64)]
        self._handle = self._lib.ts_create(
            n_chains, dp(arrs[0]), ip(arrs[1]), dp(arrs[2]), dp(arrs[3]),
            dp(arrs[4]), float(geo.merge_offset), float(geo.merge_zone_lo),
            len(geo.loop_names), ip(arrs[5]), dp(arrs[6]),
            float(geo.ramp_edge_end), float(detector_period_s), dp(arrs[7]), 0,
        )
        self._lib.ts_set_accel_noise(
            self._handle, float(getattr(self.cfg, "accel_noise_sigma", 0.0)))
        self._ep_count = 0
        self.demand = DemandDraw(0, 0, 0, 0.0)
        self._snap_pos = np.zeros(_SNAP_CAP, np.float64)
        self._snap_speed = np.zeros(_SNAP_CAP, np.float64)
        self._snap_chain = np.zeros(_SNAP_CAP, np.int32)
        self._snap_con = np.zeros(_SNAP_CAP, np.uint8)
        self.reset(seed=0)

    def __del__(self):
        try:
            self._lib.ts_destroy(self._handle)
        except Exception:
            pass

    # -- lifecycle ---------------------------------------------------------
    def reset(self, seed: int | None = None) -> None:
        if seed is None:
            seed = self._ep_count
        self._ep_count += 1
        self.demand = draw_demand(self.cfg, random.Random(seed))
        self._lib.ts_reset(
            self._handle, float(self.demand.main_flow_vph),
            float(self.demand.on_ramp_flow_vph),
            float(self.demand.off_ramp_flow_vph),
            float(self.demand.pen_rate), int(seed) & 0xFFFFFFFF,
        )

    def step(self) -> None:
        self._lib.ts_step(self._handle, self._lib.ts_get_phase(self._handle), 1)

    # -- time / TL ---------------------------------------------------------
    def time(self) -> float:
        return float(self._lib.ts_time(self._handle))

    # -- calibration introspection (mirrors sim/core.py zone_count and
    # SimState.breakdown; used by scripts/diag_sim_trace.py) ---------------
    def breakdown(self) -> float:
        return float(self._lib.ts_breakdown(self._handle))

    def zone_count(self) -> int:
        return int(self._lib.ts_zone_count(self._handle))

    def set_phase(self, phase_index: int) -> None:
        self._lib.ts_set_phase(self._handle, int(phase_index))

    def get_phase(self) -> int:
        return int(self._lib.ts_get_phase(self._handle))

    # -- detectors ---------------------------------------------------------
    def _indices(self, loop_id: str):
        idx = [self._loop_index[loop_id]]
        idx += self._mirror.get(loop_id, [])
        return idx

    def interval_vehicle_count(self, loop_id: str) -> int:
        return sum(self._lib.ts_interval_count(self._handle, i)
                   for i in self._indices(loop_id))

    def interval_occupancy(self, loop_id: str) -> float:
        # The @ramp mirror shares the physical lane with the main loop, so
        # the occupancies are additive (non-overlapping streams).
        return sum(self._lib.ts_interval_occ(self._handle, i)
                   for i in self._indices(loop_id))

    def last_step_vehicle_count(self, loop_id: str) -> int:
        return sum(self._lib.ts_step_count(self._handle, i)
                   for i in self._indices(loop_id))

    def last_step_mean_speed(self, loop_id: str) -> float:
        total_n = 0
        total_s = 0.0
        for i in self._indices(loop_id):
            n = self._lib.ts_step_count(self._handle, i)
            v = self._lib.ts_step_speed(self._handle, i)
            if n > 0 and v >= 0:
                total_n += n
                total_s += n * v
        return total_s / total_n if total_n else -1.0

    # -- edges -------------------------------------------------------------
    def edge_vehicle_count(self, edge_id: str) -> int:
        geo = self._geo
        if edge_id == self.spec.on_ramp_edge:
            return self._lib.ts_chain_count(self._handle, 3, 0.0, geo.ramp_edge_end)
        if edge_id == self.spec.upstream_edge:
            # main_road spans chain segments 2..3 of the mainline chains
            # (MAIN_CHAIN_EDGES order), so its chain-coordinate window is
            # [seg_end[1], seg_end[2]].
            lo = float(geo.seg_end[0, 1])
            hi = float(geo.seg_end[0, 2])
            return sum(self._lib.ts_chain_count(self._handle, c, lo, hi)
                       for c in range(3))
        return 0

    # -- vehicles ----------------------------------------------------------
    def vehicle_snapshot(self) -> VehicleSnapshot:
        c = ctypes
        n = self._lib.ts_snapshot(
            self._handle,
            self._snap_pos.ctypes.data_as(c.POINTER(c.c_double)),
            self._snap_speed.ctypes.data_as(c.POINTER(c.c_double)),
            self._snap_chain.ctypes.data_as(c.POINTER(c.c_int)),
            self._snap_con.ctypes.data_as(c.POINTER(c.c_uint8)),
            _SNAP_CAP,
        )
        lane_ids, lane_pos = _chain_to_lane(
            self._snap_chain[:n], self._snap_pos[:n])
        return VehicleSnapshot(
            lane_ids=lane_ids,
            lane_pos=lane_pos.astype(np.float32),
            speed=self._snap_speed[:n].astype(np.float32),
            is_connected=self._snap_con[:n].astype(bool),
        )

    # -- metadata ----------------------------------------------------------
    def scenario_info(self) -> dict:
        return self.demand.scenario_info()

    def sim_stats(self) -> dict:
        out = np.zeros(8, np.float64)
        self._lib.ts_trip_stats(
            self._handle, out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
        return {
            "total_running_vehicles": int(out[4] - out[0]),
            "total_departed": int(out[4]),
            "total_arrived": int(out[0]),
        }

    def episode_artifacts(self) -> dict:
        """Full tripinfo-equivalent stats: the same key set the reference's
        results CSVs carry (evaluation/parsers.py:21-102) — totals, medians,
        sample std-devs, per-route (Mainline/On-Ramp/Off-Ramp) aggregates,
        and wheel-power-model emissions (sim/physics.py; completed trips
        only, matching the per-trip tripinfo emissions)."""
        out = np.zeros(24, np.float64)
        self._lib.ts_trip_stats_full(
            self._handle, out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
        (arrived, travel, loss, waited, departed, loaded, _t,
         co2, fuel, nox, med_tt, std_tt, med_loss, std_loss, ss_loss) = out[:15]
        a = max(arrived, 1.0)
        trip_stats = {
            "total_throughput": int(arrived),
            "total_travel_time": travel,
            "avg_travel_time": travel / a,
            "median_travel_time": med_tt,
            "std_dev_travel_time": std_tt,
            "total_time_loss": loss,
            "avg_time_loss": loss / a,
            "median_time_loss": med_loss,
            "std_dev_time_loss": std_loss,
            "sum_of_squared_time_loss": ss_loss,
            "total_waiting_time": waited,
            "avg_waiting_time": waited / a,
            "num_teleported_tripinfo": 0,
            "total_co2_mg": co2,
            "total_fuel_ml": fuel,
            "total_nox_mg": nox,
        }
        for r, route in enumerate(("Mainline", "On-Ramp", "Off-Ramp")):
            n, tsum, lsum = out[15 + 3 * r: 18 + 3 * r]
            trip_stats[f"{route}_throughput"] = int(n)
            trip_stats[f"{route}_avg_travel_time"] = tsum / n if n else np.nan
            trip_stats[f"{route}_avg_time_loss"] = lsum / n if n else np.nan
        return {
            "trip_stats": trip_stats,
            "sim_log_stats": {
                "demand_loaded": int(loaded),
                "demand_inserted": int(departed),
                "service_rate": departed / max(loaded, 1.0),
                "num_emergency_stops": 0,
            },
        }


# Chain-coordinate -> SUMO lane-id mapping (inverse of sim/geometry.py),
# derived from the scenario spec's edge lengths along the shared chain-edge
# lists — one definition site for the corridor layout.
from ...sim.geometry import MAIN_CHAIN_EDGES, RAMP_CHAIN_EDGES  # noqa: E402


def _chain_bounds(spec: ScenarioSpec, edge_ids) -> np.ndarray:
    """Cumulative edge-end coordinates; the final edge is unbounded so
    merged vehicles past the chain end still map to the last edge."""
    e = {edge.id: edge for edge in spec.edges}
    bounds = np.cumsum([e[i].length_m for i in edge_ids]).astype(np.float64)
    bounds[-1] = 1e18
    return bounds


_MAIN_EDGES = MAIN_CHAIN_EDGES
_MAIN_BOUNDS = _chain_bounds(RAMP_1X3, MAIN_CHAIN_EDGES)
_RAMP_EDGES = RAMP_CHAIN_EDGES
_RAMP_BOUNDS = _chain_bounds(RAMP_1X3, RAMP_CHAIN_EDGES)


def _chain_to_lane(chain: np.ndarray, pos: np.ndarray):
    lane_ids = []
    lane_pos = np.zeros(len(chain), np.float64)
    for i, (c, p) in enumerate(zip(chain, pos)):
        if c < 3:
            seg = int(np.searchsorted(_MAIN_BOUNDS, p, side="right"))
            seg = min(seg, len(_MAIN_EDGES) - 1)
            edge = _MAIN_EDGES[seg]
            start = 0.0 if seg == 0 else _MAIN_BOUNDS[seg - 1]
            lane = c + 1 if edge == "acceleration_area" else c
            lane_ids.append(f"{edge}_{lane}")
            lane_pos[i] = p - start
        elif c == 3:
            seg = int(np.searchsorted(_RAMP_BOUNDS, p, side="right"))
            seg = min(seg, len(_RAMP_EDGES) - 1)
            edge = _RAMP_EDGES[seg]
            start = 0.0 if seg == 0 else _RAMP_BOUNDS[seg - 1]
            lane_ids.append(f"{edge}_0")
            lane_pos[i] = p - start
        else:
            lane_ids.append("off_chain")
            lane_pos[i] = p
    return lane_ids, lane_pos
