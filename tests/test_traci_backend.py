"""Mock-TraCI coverage for envs/backends/traci_backend.py.

SUMO is not installed in CI; a scripted fake ``libsumo`` module (installed
into sys.modules) exercises the backend's real code paths — CLI assembly
with the SUMO_EVAL_SEED/SUMO_EVAL_LOG_FILE side channel (reference
sumo_env.py:146-190), seeded route-file generation (:559-634), vehicle
subscription management (:306-310), internal-lane remapping (:210-224,
253-258), detector getters incl. the defensive TraCIException fallbacks
(:427-520), and a full control-cycle episode through RampMeterEnv.
"""

from __future__ import annotations

import sys
import types

import numpy as np
import pytest

from multimodal_drl_rmc_tpu.config import EnvConfig, ScenarioConfig
from multimodal_drl_rmc_tpu.envs.scenario import RAMP_1X3


class _Constants:
    VAR_LANE_ID = 0x51
    VAR_LANEPOSITION = 0x56
    VAR_SPEED = 0x40
    VAR_TYPE = 0x4F


class FakeSumo(types.ModuleType):
    """Scripted in-process stand-in for the ``libsumo`` module.

    The libsumo code path uses the module object itself as the connection
    (traci_backend.py:105-107), so every namespace the backend touches
    lives here: simulation, vehicle, trafficlight, inductionloop, edge.
    """

    def __init__(self):
        super().__init__("libsumo")
        self.constants = _Constants()
        self.start_params: list[list[str]] = []
        self.running = False
        self.closed_count = 0
        self._t = 0.0
        self._phase = 0
        self._phase_durations: list[float] = []
        # veh id -> dict(depart, lane, pos, speed, type)
        self.script_vehicles: dict = {}
        self._departed_last_step: list[str] = []
        self._subscriptions: dict = {}
        self.subscribe_calls: list[str] = []
        # loop id -> scripted readings; ids in raise_for raise instead
        self.loop_interval_count: dict = {}
        self.loop_interval_occ: dict = {}
        self.loop_step_count: dict = {}
        self.loop_step_speed: dict = {}
        self.edge_counts: dict = {}
        self.raise_for: set = set()
        self.min_expected = 10
        self.departed_total = 0
        self.arrived_total = 0
        # Recorded call trace: ("setPhase", idx) / ("setPhaseDuration", s) /
        # ("step",) / ("interval_read", loop) / ("queue_read", edge) tuples,
        # for replaying a control cycle against the reference's RPC order.
        self.trace: list[tuple] = []

        fake = self

        class _Simulation:
            @staticmethod
            def getTime():
                return fake._t

            @staticmethod
            def getDepartedIDList():
                return list(fake._departed_last_step)

            @staticmethod
            def getMinExpectedNumber():
                return fake.min_expected

            @staticmethod
            def getDepartedNumber():
                return fake.departed_total

            @staticmethod
            def getArrivedNumber():
                return fake.arrived_total

        class _Vehicle:
            @staticmethod
            def subscribe(veh_id, var_list):
                fake.subscribe_calls.append(veh_id)
                fake._subscriptions[veh_id] = list(var_list)

            @staticmethod
            def getAllSubscriptionResults():
                c = fake.constants
                out = {}
                for vid in fake._subscriptions:
                    v = fake.script_vehicles.get(vid)
                    if v is None or v["depart"] > fake._t:
                        continue
                    out[vid] = {
                        c.VAR_LANE_ID: v["lane"],
                        c.VAR_LANEPOSITION: v["pos"],
                        c.VAR_SPEED: v["speed"],
                        c.VAR_TYPE: v["type"],
                    }
                return out

        class _TrafficLight:
            @staticmethod
            def setPhase(tl_id, idx):
                assert tl_id == RAMP_1X3.tl_node
                fake.trace.append(("setPhase", int(idx)))
                fake._phase = int(idx)

            @staticmethod
            def getPhase(tl_id):
                return fake._phase

            @staticmethod
            def setPhaseDuration(tl_id, dur):
                fake.trace.append(("setPhaseDuration", float(dur)))
                fake._phase_durations.append(float(dur))

            @staticmethod
            def getRedYellowGreenState(tl_id):
                return "G" if fake._phase == 0 else "r"

        def _scripted(table, default, trace_as=None):
            def get(loop_id):
                if trace_as:
                    fake.trace.append((trace_as, loop_id))
                if loop_id in fake.raise_for:
                    raise RuntimeError(f"TraCI error on {loop_id}")
                return table.get(loop_id, default)

            return get

        class _InductionLoop:
            getLastIntervalVehicleNumber = staticmethod(
                _scripted(self.loop_interval_count, 0, "interval_read"))
            getLastIntervalOccupancy = staticmethod(
                _scripted(self.loop_interval_occ, 0.0, "interval_read"))
            getLastStepVehicleNumber = staticmethod(
                _scripted(self.loop_step_count, 0))
            getLastStepMeanSpeed = staticmethod(
                _scripted(self.loop_step_speed, -1.0))

        class _Edge:
            @staticmethod
            def getLastStepVehicleNumber(edge_id):
                fake.trace.append(("queue_read", edge_id))
                if edge_id in fake.raise_for:
                    raise RuntimeError(f"TraCI error on {edge_id}")
                return fake.edge_counts.get(edge_id, 0)

            @staticmethod
            def getLaneNumber(edge_id):
                if edge_id in fake.raise_for:
                    raise RuntimeError(f"TraCI error on {edge_id}")
                return RAMP_1X3.edge_lane_count(edge_id)

        self.simulation = _Simulation()
        self.vehicle = _Vehicle()
        self.trafficlight = _TrafficLight()
        self.inductionloop = _InductionLoop()
        self.edge = _Edge()

    # -- module-level connection API (libsumo style) ----------------------
    def start(self, params):
        self.start_params.append(list(params))
        self.running = True
        self._t = 0.0
        self._phase = 0
        self._subscriptions = {}
        self._departed_last_step = []

    def simulationStep(self):
        assert self.running, "simulationStep on a closed connection"
        self.trace.append(("step",))
        self._t += 1.0
        self._departed_last_step = [
            vid for vid, v in self.script_vehicles.items()
            if v["depart"] == self._t
        ]
        self.departed_total += len(self._departed_last_step)
        for vid, v in self.script_vehicles.items():
            if v["depart"] <= self._t:
                v["pos"] += v["speed"]

    def close(self):
        self.running = False
        self.closed_count += 1


@pytest.fixture()
def fake_sumo(monkeypatch, tmp_path):
    """Install a scripted libsumo and neutralize the netconvert build."""
    fake = FakeSumo()
    monkeypatch.setitem(sys.modules, "libsumo", fake)

    from multimodal_drl_rmc_tpu.envs.backends import traci_backend as tb

    def fake_write_scenario(spec, out_dir, episode_seconds=3600.0):
        import os

        os.makedirs(out_dir, exist_ok=True)
        cfg_path = str(tmp_path / f"{spec.name}.sumocfg")
        with open(cfg_path, "w") as f:
            f.write("<configuration/>")
        return {"net": cfg_path, "sumocfg": cfg_path}

    monkeypatch.setattr(tb, "write_sumo_scenario", fake_write_scenario)
    return fake, tb


def _make_backend(tb, tmp_path, **cfg_kw):
    cfg = ScenarioConfig(**cfg_kw) if cfg_kw else ScenarioConfig()
    return tb.TraciBackend(cfg, RAMP_1X3, data_dir=str(tmp_path / "data"))


def test_cli_params_and_eval_side_channel(fake_sumo, tmp_path, monkeypatch):
    fake, tb = fake_sumo
    log_path = str(tmp_path / "sumo.log")
    monkeypatch.setenv("SUMO_EVAL_SEED", "77")
    monkeypatch.setenv("SUMO_EVAL_LOG_FILE", log_path)
    backend = _make_backend(tb, tmp_path)
    backend.reset(seed=0)
    params = fake.start_params[-1]
    assert params[0] == "sumo"
    assert params[params.index("--seed") + 1] == "77"
    assert params[params.index("--log") + 1] == log_path
    assert params[params.index("--tripinfo-output") + 1] == backend.tripinfo_path
    assert params[params.index("--time-to-teleport") + 1] == "300.0"
    art = backend.episode_artifacts()
    assert art["tripinfo_xml"] == backend.tripinfo_path
    assert art["sumo_log"] == log_path
    backend.close()


def test_fixed_seed_used_without_env_var(fake_sumo, tmp_path, monkeypatch):
    fake, tb = fake_sumo
    monkeypatch.delenv("SUMO_EVAL_SEED", raising=False)
    backend = _make_backend(tb, tmp_path, fixed_seed=True, seed_value=123)
    backend.reset()
    params = fake.start_params[-1]
    assert params[params.index("--seed") + 1] == "123"
    backend.close()


def test_route_file_generation_is_seeded(fake_sumo, tmp_path):
    fake, tb = fake_sumo
    backend = _make_backend(tb, tmp_path)
    backend.reset(seed=5)
    demand_a = backend.scenario_info()
    with open(backend._route_path) as f:
        route_a = f.read()
    backend.reset(seed=5)
    assert backend.scenario_info() == demand_a
    with open(backend._route_path) as f:
        route_b = f.read()
    # Same demand draw; only the episode index differs in the XML comment.
    assert demand_a["main_flow_vph"] in list(ScenarioConfig().veh_per_hour_main)
    assert f'vType id="def"' in route_a and f'vType id="con"' in route_a
    assert route_a.replace("episode_index", "") != ""  # generated non-empty
    del route_b
    backend.close()


def test_subscribe_once_and_snapshot(fake_sumo, tmp_path):
    fake, tb = fake_sumo
    fake.script_vehicles = {
        "v_def": dict(depart=1.0, lane="main_road_1", pos=10.0, speed=20.0,
                      type="def"),
        "v_con": dict(depart=1.0, lane="main_road_0", pos=30.0, speed=15.0,
                      type="con"),
        "v_later": dict(depart=3.0, lane="on_ramp_0", pos=0.0, speed=5.0,
                        type="con"),
    }
    backend = _make_backend(tb, tmp_path)
    backend.reset(seed=0)
    backend.step()   # t=1: v_def + v_con depart and get subscribed
    backend.step()   # t=2: nothing new departs
    assert sorted(fake.subscribe_calls) == ["v_con", "v_def"]
    snap = backend.vehicle_snapshot()
    assert len(snap.lane_ids) == 2
    idx = {lane: i for i, lane in enumerate(snap.lane_ids)}
    assert snap.is_connected[idx["main_road_0"]]
    assert not snap.is_connected[idx["main_road_1"]]
    # positions advanced by speed each of the 2 steps after depart
    assert snap.lane_pos[idx["main_road_1"]] == pytest.approx(10.0 + 2 * 20.0)
    backend.step()   # t=3: v_later departs
    assert "v_later" in fake.subscribe_calls
    assert len(fake.subscribe_calls) == 3  # nobody re-subscribed
    backend.close()


def test_internal_lane_remap(fake_sumo, tmp_path):
    fake, tb = fake_sumo
    fake.script_vehicles = {
        "v1": dict(depart=1.0, lane=":ramp_meter_0_0", pos=3.7, speed=8.0,
                   type="con"),
    }
    backend = _make_backend(tb, tmp_path)
    backend.reset(seed=0)
    backend._internal_map = {":ramp_meter_0_0": "passage_area_0"}
    backend.step()
    snap = backend.vehicle_snapshot()
    assert snap.lane_ids == ["passage_area_0"]
    assert snap.lane_pos[0] == 0.0  # remapped vehicles restart the lane
    backend.close()


def test_detector_getters_and_defensive_fallbacks(fake_sumo, tmp_path):
    fake, tb = fake_sumo
    fake.loop_interval_count["up_stream_sens_0"] = 7
    fake.loop_interval_occ["up_stream_sens_0"] = 12.5
    fake.loop_step_count["up_stream_sens_0"] = 2
    fake.loop_step_speed["up_stream_sens_0"] = 21.0
    fake.edge_counts["on_ramp"] = 9
    backend = _make_backend(tb, tmp_path)
    backend.reset(seed=0)
    assert backend.interval_vehicle_count("up_stream_sens_0") == 7
    assert backend.interval_occupancy("up_stream_sens_0") == 12.5
    assert backend.last_step_vehicle_count("up_stream_sens_0") == 2
    assert backend.last_step_mean_speed("up_stream_sens_0") == 21.0
    assert backend.edge_vehicle_count("on_ramp") == 9
    assert backend.edge_lane_count("main_road") == 3

    # TraCIException paths return the reference's neutral values
    # (sumo_env.py:427-520): counts 0, occupancy 0.0, speed -1.0.
    fake.raise_for = {"up_stream_sens_0", "on_ramp", "main_road"}
    assert backend.interval_vehicle_count("up_stream_sens_0") == 0
    assert backend.interval_occupancy("up_stream_sens_0") == 0.0
    assert backend.last_step_vehicle_count("up_stream_sens_0") == 0
    assert backend.last_step_mean_speed("up_stream_sens_0") == -1.0
    assert backend.edge_vehicle_count("on_ramp") == 0
    # lane count falls back to the scenario spec, not 0
    assert backend.edge_lane_count("main_road") == 3
    backend.close()


def test_phase_controls_and_termination(fake_sumo, tmp_path):
    fake, tb = fake_sumo
    backend = _make_backend(tb, tmp_path)
    backend.reset(seed=0)
    backend.set_phase(1)
    assert backend.get_phase() == 1
    assert backend.get_ryg_state() == "r"
    backend.set_phase(0)
    assert backend.get_ryg_state() == "G"
    backend.set_phase_duration(25.0)
    assert fake._phase_durations[-1] == 25.0

    assert not backend.is_end()
    fake.min_expected = 0
    assert backend.is_end()

    fake.departed_total, fake.arrived_total = 42, 30
    stats = backend.sim_stats()
    assert stats["total_departed"] == 42
    assert stats["total_arrived"] == 30
    assert stats["total_running_vehicles"] == 12
    backend.close()


def test_reset_restarts_connection_and_close_is_idempotent(fake_sumo, tmp_path):
    fake, tb = fake_sumo
    backend = _make_backend(tb, tmp_path)
    backend.reset(seed=0)
    backend.reset(seed=1)   # second reset stops the first connection
    assert fake.closed_count == 1
    assert len(fake.start_params) == 2
    backend.close()
    backend.close()
    assert fake.closed_count == 2


def test_full_control_cycle_through_rl_controller(fake_sumo, tmp_path):
    """A full RampMeterEnv episode over the mocked-TraCI backend: reset
    warm-up, green/red phase stepping, cycle-end detector aggregation, CV
    grid from subscriptions, reward and info-dict schema."""
    from multimodal_drl_rmc_tpu.envs.rl_controller import RampMeterEnv

    fake, tb = fake_sumo
    for loop in RAMP_1X3.upstream_state_loops:
        fake.loop_interval_count[loop] = 10
        fake.loop_interval_occ[loop] = 8.0
        fake.loop_step_count[loop] = 1
        fake.loop_step_speed[loop] = 25.0
    fake.edge_counts["on_ramp"] = 4
    # Stationary CV inside the grid window (main_road is 488.34 m; the grid
    # covers its last 132 m, so pos 400 sits in the CV grid all episode).
    fake.script_vehicles = {
        "cv1": dict(depart=1.0, lane="main_road_0", pos=400.0, speed=0.0,
                    type="con"),
    }
    cfg = EnvConfig(scenario=ScenarioConfig(episode_seconds=120.0))
    backend = tb.TraciBackend(cfg.scenario, RAMP_1X3,
                              data_dir=str(tmp_path / "data"))
    env = RampMeterEnv(backend, cfg)
    obs = env.reset(seed=0)
    assert obs.shape == (cfg.obs_size,)
    assert backend.time() == pytest.approx(5.0)  # 5 s warm-up

    obs, rew, done, info = env.step(3)  # 20 s green / 20 s red
    assert backend.time() == pytest.approx(45.0)
    assert obs.shape == (cfg.obs_size,)
    # Detector aggregation: 3 upstream loops x 10 counts over the 40 s
    # cycle -> 2700 veh/h.
    assert info["mainline_flow_upstream_v/h"] == pytest.approx(3 * 10 * 90.0)
    assert info["mainline_occ_upstream_percent"] == pytest.approx(8.0)
    assert info["ramp_queue_veh"] == pytest.approx(4.0)
    assert info["chosen_green_time_sec"] == 20.0
    assert info["current_tl_phase_index"] == 1  # ends the cycle red
    assert np.isfinite(rew)
    # CV vehicle appears in the grid part of the hybrid obs.
    assert obs[cfg.macro_state_size:].max() > 0.0
    assert not done
    obs, rew, done, info = env.step(0)
    obs, rew, done, info = env.step(7)
    assert done  # 125 s >= 120 s episode
    env.close()
    assert not fake.running


def test_recorded_trace_of_one_control_cycle(fake_sumo, tmp_path):
    """Recorded-trace replay of ONE 40 s control cycle: the exact TraCI
    RPC order the reference issues (rl_controller.py:211-294) — green
    program set, ~green_sec stepped sim-seconds with a per-step ramp-queue
    read, red program set, the remaining sim-seconds, and ONLY THEN the
    cycle-end interval detector aggregation (:129-151). Guards against
    regressions that move detector reads inside the phase loop (which
    would read half-finished 40 s aggregation windows on real SUMO)."""
    from multimodal_drl_rmc_tpu.envs.rl_controller import RampMeterEnv

    fake, tb = fake_sumo
    cfg = EnvConfig(scenario=ScenarioConfig(episode_seconds=400.0))
    backend = tb.TraciBackend(cfg.scenario, RAMP_1X3,
                              data_dir=str(tmp_path / "data"))
    env = RampMeterEnv(backend, cfg)
    env.reset(seed=0)
    fake.trace.clear()

    env.step(3)  # 20 s green / 20 s red

    trace = list(fake.trace)
    # Phase program order: green first, then red, each with its duration.
    assert trace[0] == ("setPhase", 0)
    assert trace[1] == ("setPhaseDuration", 20.0)
    red_at = trace.index(("setPhase", 1))
    assert trace[red_at + 1] == ("setPhaseDuration", 20.0)
    # 20 green sim-seconds, each followed by the per-step queue read
    # (reference's queue accumulation inside the phase loop).
    green_part = trace[2:red_at]
    assert green_part == [("step",), ("queue_read", "on_ramp")] * 20
    # 20 red sim-seconds after the red program switch.
    steps_after_red = [i for i, ev in enumerate(trace)
                       if ev == ("step",) and i > red_at]
    assert len(steps_after_red) == 20
    last_step = steps_after_red[-1]
    # Cycle-end detector aggregation strictly AFTER the last sim step:
    # no interval read may occur before the 40 s window closes.
    interval_reads = [i for i, ev in enumerate(trace)
                      if ev[0] == "interval_read"]
    assert interval_reads and min(interval_reads) > last_step
    # The aggregation covers every state detector group (~30 RPCs).
    read_loops = {trace[i][1] for i in interval_reads}
    for group in (RAMP_1X3.upstream_state_loops,
                  RAMP_1X3.bottleneck_state_loops,
                  RAMP_1X3.downstream_loops):
        assert set(group) <= read_loops
    env.close()
