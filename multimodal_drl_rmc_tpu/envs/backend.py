"""Traffic-backend abstraction: the seam between the MDP and any simulator.

The reference talks to SUMO through ~30 ad-hoc TraCI getter helpers defined
on the env base class itself (sumo_env.py:388-520), which welds the MDP to
one global TraCI connection (and hence to n_env=1). Here the same surface is
an explicit protocol, implemented by:

  * ``FakeTrafficBackend`` (envs/fake_backend.py)  — scripted dynamics, tests
  * ``NativeSimBackend``   (envs/backends/native.py) — C++ microsim bridge
  * ``TraciBackend``       (envs/backends/traci_backend.py) — SUMO, if present
  * the on-device JAX simulator (sim/) bypasses this host protocol entirely

Detector semantics mirror SUMO E1 induction loops as the reference consumes
them:

  * ``interval_*`` getters report the most recently *completed* aggregation
    interval of length ``LoopSpec.period_s`` (TraCI ``getLastInterval*``,
    consumed at sumo_env.py:427-458).
  * ``last_step_*`` getters report the previous single sim step (TraCI
    ``getLastStep*``, consumed by the flow-weighted speed helper,
    sumo_env.py:482-501).
"""

from __future__ import annotations

import abc
import random
from dataclasses import dataclass
from typing import Sequence

import numpy as np

from ..config import ScenarioConfig
from .scenario import ScenarioSpec


@dataclass
class VehicleSnapshot:
    """Positions of (connected) vehicles for the CV-grid observation.

    ``lane_ids`` contain resolved (non-internal) lane ids; backends that model
    internal/junction lanes must remap them to the destination lane with
    lane_pos 0 first, the way the reference does with its
    ``internal_to_destination_map`` (sumo_env.py:210-224, 253-258).
    """

    lane_ids: Sequence[str]
    lane_pos: np.ndarray     # [N] f32 — metres from lane start
    speed: np.ndarray        # [N] f32 — m/s
    is_connected: np.ndarray  # [N] bool

    @staticmethod
    def empty() -> "VehicleSnapshot":
        return VehicleSnapshot(
            lane_ids=[],
            lane_pos=np.zeros((0,), np.float32),
            speed=np.zeros((0,), np.float32),
            is_connected=np.zeros((0,), bool),
        )


@dataclass
class DemandDraw:
    """Per-episode demand realization (reference sumo_env.py:559-586)."""

    main_flow_vph: int
    on_ramp_flow_vph: int
    off_ramp_flow_vph: int
    pen_rate: float

    def scenario_info(self) -> dict:
        # Key names match reference get_scenario_info (sumo_env.py:550-557).
        return {
            "main_flow_vph": self.main_flow_vph,
            "on_ramp_flow_vph": self.on_ramp_flow_vph,
            "off_ramp_flow_vph": self.off_ramp_flow_vph,
            "con_penetration_rate": self.pen_rate,
        }


def draw_demand(cfg: ScenarioConfig, rng: random.Random) -> DemandDraw:
    """Weighted random demand draw (reference sumo_env.py:566-586)."""
    return DemandDraw(
        main_flow_vph=rng.choices(
            list(cfg.veh_per_hour_main), weights=list(cfg.veh_per_hour_main_weights)
        )[0],
        on_ramp_flow_vph=rng.choices(
            list(cfg.veh_per_hour_on_ramp), weights=list(cfg.veh_per_hour_on_ramp_weights)
        )[0],
        off_ramp_flow_vph=rng.choices(
            list(cfg.veh_per_hour_off_ramp), weights=list(cfg.veh_per_hour_off_ramp_weights)
        )[0],
        pen_rate=rng.uniform(*cfg.con_penetration_rate_range),
    )


GREEN_PHASE = 0
RED_PHASE = 1


class TrafficBackend(abc.ABC):
    """One simulated episode-generating traffic process."""

    spec: ScenarioSpec
    sim_step_seconds: float = 1.0

    # -- lifecycle ---------------------------------------------------------
    @abc.abstractmethod
    def reset(self, seed: int | None = None) -> None:
        """Start a fresh episode (new demand draw, t=0)."""

    @abc.abstractmethod
    def step(self) -> None:
        """Advance the simulation by one sim step."""

    def close(self) -> None:
        pass

    # -- time / termination ------------------------------------------------
    @abc.abstractmethod
    def time(self) -> float:
        """Current simulation time in seconds."""

    def is_end(self) -> bool:
        """True when no more vehicles are expected (TraCI
        getMinExpectedNumber()<=0 equivalent, sumo_env.py:375-379)."""
        return False

    # -- traffic light -----------------------------------------------------
    @abc.abstractmethod
    def set_phase(self, phase_index: int) -> None: ...

    @abc.abstractmethod
    def get_phase(self) -> int: ...

    def set_phase_duration(self, duration_sec: float) -> None:
        """Advisory; phase holds until set_phase anyway in our control laws."""

    def get_ryg_state(self) -> str:
        return "G" if self.get_phase() == GREEN_PHASE else "r"

    # -- detectors ---------------------------------------------------------
    @abc.abstractmethod
    def interval_vehicle_count(self, loop_id: str) -> int: ...

    @abc.abstractmethod
    def interval_occupancy(self, loop_id: str) -> float:
        """Percent occupancy over the last completed interval."""

    @abc.abstractmethod
    def last_step_vehicle_count(self, loop_id: str) -> int: ...

    @abc.abstractmethod
    def last_step_mean_speed(self, loop_id: str) -> float:
        """m/s over the last sim step; -1.0 when no vehicle was on the loop
        (SUMO convention the flow-weighted helper relies on)."""

    # -- edges -------------------------------------------------------------
    @abc.abstractmethod
    def edge_vehicle_count(self, edge_id: str) -> int:
        """Vehicles currently on the edge (ramp-queue proxy,
        sumo_env.py:504-509)."""

    def edge_lane_count(self, edge_id: str) -> int:
        return self.spec.edge_lane_count(edge_id)

    # -- vehicles (for the CV grid) ---------------------------------------
    @abc.abstractmethod
    def vehicle_snapshot(self) -> VehicleSnapshot: ...

    # -- episode metadata --------------------------------------------------
    @abc.abstractmethod
    def scenario_info(self) -> dict: ...

    def sim_stats(self) -> dict:
        """Running totals (reference log_info extras, sumo_env.py:655-661)."""
        return {
            "total_running_vehicles": 0,
            "total_departed": 0,
            "total_arrived": 0,
        }

    def episode_artifacts(self) -> dict:
        """End-of-episode artifacts for the evaluation harness.

        Keys (all optional): 'tripinfo_xml' / 'sumo_log' — file paths for
        the SUMO parsers; 'trip_stats' / 'sim_log_stats' — already-aggregated
        dicts in the same schema for backends that track trips natively.
        """
        return {}


# ---------------------------------------------------------------------------
# Aggregation helpers over loop groups (reference sumo_env.py:427-501).
# ---------------------------------------------------------------------------


def loops_flow_vph(backend: TrafficBackend, loop_ids: Sequence[str], interval_sec: float) -> float:
    """Summed interval counts extrapolated to veh/h (sumo_env.py:427-437)."""
    if not loop_ids or interval_sec <= 0:
        return 0.0
    total = sum(backend.interval_vehicle_count(l) for l in loop_ids)
    return total * 3600.0 / interval_sec


def loops_occupancy_percent(backend: TrafficBackend, loop_ids: Sequence[str]) -> float:
    """Mean interval occupancy percent (sumo_env.py:444-454)."""
    if not loop_ids:
        return 0.0
    return float(np.mean([backend.interval_occupancy(l) for l in loop_ids]))


def loops_flow_weighted_speed(backend: TrafficBackend, loop_ids: Sequence[str]) -> float:
    """Last-step flow-weighted mean speed in m/s (sumo_env.py:482-501).

    Loops with no vehicle in the last step (flow 0 or speed<0) are skipped;
    returns 0.0 when nothing passed — matching the reference exactly.
    """
    total_speed = 0.0
    total_flow = 0.0
    for loop_id in loop_ids:
        flow = backend.last_step_vehicle_count(loop_id)
        speed = backend.last_step_mean_speed(loop_id)
        if flow > 0 and speed >= 0:
            total_speed += speed * flow
            total_flow += flow
    return total_speed / total_flow if total_flow > 0 else 0.0
