"""SUMO backend over TraCI/libsumo (evaluation-grade fidelity).

Behavioral port target: the reference's TraCI plumbing in ``SumoEnv``
(sumo_env.py) — process lifecycle + CLI assembly (:146-190), detector
getters (:427-520), vehicle subscriptions for the CV grid (:306-310),
per-episode randomized route generation (:559-634), and the
``SUMO_EVAL_SEED`` / ``SUMO_EVAL_LOG_FILE`` eval side channel (:149-173).

Differences by design:
  * prefers **libsumo** (in-process, no socket) and falls back to TraCI
    with a per-instance labeled connection — removing the module-global
    single-connection limit that capped the reference at n_env=1
    (SURVEY.md §2 parallelism note);
  * scenario XML is generated from the declarative spec
    (envs/scenario.py write_sumo_scenario) instead of shipped by hand;
  * implements the same ``TrafficBackend`` protocol as the fake/native
    backends, so every controller/driver/test runs unchanged.

This module imports lazily and raises ImportError when no SUMO install is
present; ``make_backend('auto')`` then falls back to the native C++ sim.
"""

from __future__ import annotations

import os
import random
import tempfile

import numpy as np

from ...config import ScenarioConfig
from ..backend import DemandDraw, TrafficBackend, VehicleSnapshot, draw_demand
from ..scenario import RAMP_1X3, ScenarioSpec, route_file_xml, write_sumo_scenario


def _import_sumo():
    try:
        import libsumo as sumo  # in-process: fastest, one sim per process

        return sumo, "libsumo"
    except ImportError:
        import traci as sumo  # socket: supports labeled multi-connections

        return sumo, "traci"


class TraciBackend(TrafficBackend):
    _conn_counter = 0

    def __init__(
        self,
        scenario_cfg: ScenarioConfig | None = None,
        spec: ScenarioSpec = RAMP_1X3,
        *,
        gui: bool = False,
        data_dir: str | None = None,
    ):
        self._sumo, self._kind = _import_sumo()
        self.cfg = scenario_cfg or ScenarioConfig()
        self.spec = spec
        self.gui = gui
        self.sim_step_seconds = self.cfg.sim_step_seconds

        self.data_dir = data_dir or os.path.join(
            tempfile.gettempdir(), f"mdrlrmc_{spec.name}_{os.getpid()}")
        paths = write_sumo_scenario(spec, self.data_dir,
                                    episode_seconds=self.cfg.episode_seconds)
        if "net" not in paths:
            raise RuntimeError("netconvert not found; cannot build SUMO net")
        self._sumocfg = paths["sumocfg"]
        self._route_path = os.path.join(self.data_dir, f"{spec.name}.rou.xml")
        self.tripinfo_path = os.path.join(self.data_dir, "tripinfo.xml")
        self._label = None
        self._started = False
        self._ep_count = 0
        self.demand = DemandDraw(0, 0, 0, 0.0)
        self._tl_id = spec.tl_node
        self._internal_map: dict = {}
        self._subscribed: set = set()

    # ------------------------------------------------------------------
    def _cli_params(self) -> list[str]:
        binary = "sumo-gui" if self.gui else "sumo"
        params = [
            binary, "-c", self._sumocfg,
            "--tripinfo-output", self.tripinfo_path,
            "--device.emissions.probability", "1.0",
            "--time-to-teleport", str(self.cfg.time_to_teleport_s),
            "--waiting-time-memory", str(self.cfg.waiting_time_memory_s),
            "--no-warnings", "true",
        ]
        eval_seed = os.environ.get("SUMO_EVAL_SEED")
        if eval_seed:
            params += ["--seed", str(eval_seed)]
        elif self.cfg.fixed_seed:
            params += ["--seed", str(self.cfg.seed_value)]
        log_file = os.environ.get("SUMO_EVAL_LOG_FILE")
        if log_file:
            params += ["--log", log_file]
        if self.gui:
            params += ["--start", "true", "--quit-on-end", "true"]
        return params

    def _start(self) -> None:
        if self._kind == "libsumo":
            self._sumo.start(self._cli_params())
            self._conn = self._sumo
        else:
            TraciBackend._conn_counter += 1
            self._label = f"mdrlrmc_{TraciBackend._conn_counter}"
            self._sumo.start(self._cli_params(), label=self._label)
            self._conn = self._sumo.getConnection(self._label)
        self._started = True
        self._build_internal_lane_map()
        self._subscribed = set()

    def _stop(self) -> None:
        if self._started:
            try:
                self._conn.close()
            except Exception:
                pass
            self._started = False

    def _build_internal_lane_map(self) -> None:
        """Internal (junction) lane -> destination lane, the remap the grid
        builder needs (reference sumo_env.py:210-224)."""
        self._internal_map = {}
        try:
            from sumolib import net as sumonet

            net = sumonet.readNet(os.path.join(self.data_dir,
                                               f"{self.spec.name}.net.xml"))
            for node in net.getNodes():
                for conn in node.getConnections():
                    via = conn.getViaLaneID()
                    to_lane = conn.getToLane()
                    if via and to_lane is not None:
                        self._internal_map[via] = to_lane.getID()
        except Exception:
            pass

    # -- lifecycle ---------------------------------------------------------
    def reset(self, seed: int | None = None) -> None:
        self._stop()
        if seed is None:
            seed = self._ep_count
        self._ep_count += 1
        self.demand = draw_demand(self.cfg, random.Random(seed))
        if self.cfg.generate_route_file:
            with open(self._route_path, "w") as f:
                f.write(route_file_xml(
                    self.spec,
                    main_flow_vph=self.demand.main_flow_vph,
                    on_ramp_flow_vph=self.demand.on_ramp_flow_vph,
                    off_ramp_flow_vph=self.demand.off_ramp_flow_vph,
                    pen_rate=self.demand.pen_rate,
                    episode_seconds=self.cfg.episode_seconds,
                    episode_index=self._ep_count,
                    split_by_penetration=self.cfg.demand_split_by_penetration,
                ))
        self._start()

    def step(self) -> None:
        self._conn.simulationStep()
        for veh_id in self._conn.simulation.getDepartedIDList():
            if veh_id not in self._subscribed:
                tc = self._sumo.constants
                self._conn.vehicle.subscribe(veh_id, [
                    tc.VAR_LANE_ID, tc.VAR_LANEPOSITION,
                    tc.VAR_SPEED, tc.VAR_TYPE,
                ])
                self._subscribed.add(veh_id)

    def close(self) -> None:
        self._stop()

    # -- time / termination ------------------------------------------------
    def time(self) -> float:
        try:
            return float(self._conn.simulation.getTime())
        except Exception:
            return float("inf")

    def is_end(self) -> bool:
        try:
            return self._conn.simulation.getMinExpectedNumber() <= 0
        except Exception:
            return True

    # -- traffic light -----------------------------------------------------
    def set_phase(self, phase_index: int) -> None:
        self._conn.trafficlight.setPhase(self._tl_id, phase_index)

    def get_phase(self) -> int:
        return int(self._conn.trafficlight.getPhase(self._tl_id))

    def set_phase_duration(self, duration_sec: float) -> None:
        self._conn.trafficlight.setPhaseDuration(self._tl_id, duration_sec)

    def get_ryg_state(self) -> str:
        return self._conn.trafficlight.getRedYellowGreenState(self._tl_id)

    # -- detectors ---------------------------------------------------------
    def interval_vehicle_count(self, loop_id: str) -> int:
        try:
            return int(self._conn.inductionloop.getLastIntervalVehicleNumber(loop_id))
        except Exception:
            return 0

    def interval_occupancy(self, loop_id: str) -> float:
        try:
            return float(self._conn.inductionloop.getLastIntervalOccupancy(loop_id))
        except Exception:
            return 0.0

    def last_step_vehicle_count(self, loop_id: str) -> int:
        try:
            return int(self._conn.inductionloop.getLastStepVehicleNumber(loop_id))
        except Exception:
            return 0

    def last_step_mean_speed(self, loop_id: str) -> float:
        try:
            return float(self._conn.inductionloop.getLastStepMeanSpeed(loop_id))
        except Exception:
            return -1.0

    # -- edges -------------------------------------------------------------
    def edge_vehicle_count(self, edge_id: str) -> int:
        try:
            return int(self._conn.edge.getLastStepVehicleNumber(edge_id))
        except Exception:
            return 0

    def edge_lane_count(self, edge_id: str) -> int:
        try:
            return int(self._conn.edge.getLaneNumber(edge_id))
        except Exception:
            return self.spec.edge_lane_count(edge_id)

    # -- vehicles ----------------------------------------------------------
    def vehicle_snapshot(self) -> VehicleSnapshot:
        tc = self._sumo.constants
        try:
            results = self._conn.vehicle.getAllSubscriptionResults()
        except Exception:
            return VehicleSnapshot.empty()
        lane_ids, pos, speed, con = [], [], [], []
        for _veh, data in results.items():
            lane = data.get(tc.VAR_LANE_ID, "")
            lane_pos = float(data.get(tc.VAR_LANEPOSITION, 0.0))
            if lane.startswith(":"):
                lane = self._internal_map.get(lane, lane)
                lane_pos = 0.0
            lane_ids.append(lane)
            pos.append(lane_pos)
            speed.append(float(data.get(tc.VAR_SPEED, 0.0)))
            con.append(data.get(tc.VAR_TYPE) == self.cfg.v_type_con)
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
        try:
            dep = int(self._conn.simulation.getDepartedNumber())
            arr = int(self._conn.simulation.getArrivedNumber())
            return {
                "total_running_vehicles": dep - arr,
                "total_departed": dep,
                "total_arrived": arr,
            }
        except Exception:
            return super().sim_stats()

    def episode_artifacts(self) -> dict:
        return {
            "tripinfo_xml": self.tripinfo_path,
            "sumo_log": os.environ.get("SUMO_EVAL_LOG_FILE"),
        }
