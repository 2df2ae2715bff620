"""Ramp-metering MDP: the RL-facing control cycle over any traffic backend.

Behavioral port target: reference ``RLController`` (rl_controller.py:7-452).
Semantics preserved exactly —
  * 8 discrete green times 5..40 s inside a 40 s cycle (:17, :211-248),
  * green-then-red sub-stepping with per-step ramp-queue accumulation
    (:224-248),
  * cycle-end detector aggregation incl. the lane-0 quirks (:129-151 — the
    "lane 0 upstream" features actually read upstream loop index 1),
  * 14-feature normalized macro vector + flattened CV grid (:297-329),
  * reward = 1.5*v_merge + 1.0*v_up + 0.5*v_down - 2.0*occ_bn - 1.0*occ_up
    - 1.0*queue - 20*spillback (:388-425),
  * per-step info dict with the exact key set the CSV loggers and eval
    parsers consume (:265-292).

Architecturally it differs: the controller owns no simulator globals — it
drives an injected ``TrafficBackend``, so N controllers run in one process
(the reference's module-global ``traci`` forbids that, SURVEY.md §2 note).
"""

from __future__ import annotations

import numpy as np

from .. import guard
from ..config import EnvConfig
from .backend import (
    GREEN_PHASE,
    RED_PHASE,
    TrafficBackend,
    loops_flow_vph,
    loops_flow_weighted_speed,
    loops_occupancy_percent,
)
from .grid import build_grid, flatten_grid


class CycleMetrics:
    """Detector aggregates for one completed control cycle."""

    __slots__ = (
        "flow_upstream_vph", "flow_merging_vph", "flow_downstream_vph",
        "occ_upstream", "occ_bottleneck", "occ_downstream",
        "speed_upstream", "speed_bottleneck", "speed_downstream",
        "ramp_queue_veh",
        "flow_lane0_merging_vph", "occ_lane0_bottleneck", "speed_lane0_bottleneck",
        "flow_lane0_upstream_vph", "occ_lane0_upstream", "speed_lane0_upstream",
    )

    def __init__(self):
        for name in self.__slots__:
            setattr(self, name, 0.0)


class RampMeterEnv:
    """DRL MDP over a traffic backend (train/observe modes)."""

    def __init__(self, backend: TrafficBackend, cfg: EnvConfig | None = None, log: bool = False):
        self.backend = backend
        self.cfg = cfg or EnvConfig()
        self.log = log
        self.spec = backend.spec

        self.green_time_actions_sec = np.asarray(self.cfg.green_time_actions_sec, np.float64)
        self.action_space_n = self.cfg.n_actions
        self.observation_space_n = self.cfg.obs_size

        self.up_loops = list(self.spec.upstream_state_loops)
        self.bn_loops = list(self.spec.bottleneck_state_loops)
        self.ds_loops = list(self.spec.downstream_loops)

        self.last_action_value_sec = float(self.green_time_actions_sec[0])
        self.m = CycleMetrics()
        self._guard_occ_prev = 0.0  # previous CONTROL cycle's merge occ
        self._sum_queue = 0.0
        self._last_info: dict = {}
        self._ep_count = 0

    # ------------------------------------------------------------------
    # Cycle data collection (reference rl_controller.py:129-151)
    # ------------------------------------------------------------------
    def _collect_cycle_metrics(self) -> None:
        b, m = self.backend, self.m
        cyc = self.cfg.cycle_seconds
        m.flow_upstream_vph = loops_flow_vph(b, self.up_loops, cyc)
        m.flow_merging_vph = loops_flow_vph(b, self.bn_loops, cyc)
        m.flow_downstream_vph = loops_flow_vph(b, self.ds_loops, cyc)
        m.occ_upstream = loops_occupancy_percent(b, self.up_loops)
        m.occ_bottleneck = loops_occupancy_percent(b, self.bn_loops)
        m.occ_downstream = loops_occupancy_percent(b, self.ds_loops)
        m.speed_upstream = loops_flow_weighted_speed(b, self.up_loops)
        m.speed_bottleneck = loops_flow_weighted_speed(b, self.bn_loops)
        m.speed_downstream = loops_flow_weighted_speed(b, self.ds_loops)
        m.ramp_queue_veh = self._sum_queue / cyc if cyc > 0 else 0.0
        # Lane-0 features. NB: the reference's "lane 0 upstream" uses loop
        # index 1 of the upstream group (rl_controller.py:149-151) — kept.
        m.flow_lane0_merging_vph = loops_flow_vph(b, self.bn_loops[:1], cyc)
        m.occ_lane0_bottleneck = loops_occupancy_percent(b, self.bn_loops[:1])
        m.speed_lane0_bottleneck = loops_flow_weighted_speed(b, self.bn_loops[:1])
        m.flow_lane0_upstream_vph = loops_flow_vph(b, self.up_loops[1:2], cyc)
        m.occ_lane0_upstream = loops_occupancy_percent(b, self.up_loops[1:2])
        m.speed_lane0_upstream = loops_flow_weighted_speed(b, self.up_loops[1:2])

    # ------------------------------------------------------------------
    # Gym-ish API
    # ------------------------------------------------------------------
    def reset(self, seed: int | None = None):
        self.backend.reset(seed)
        self._ep_count += 1
        self._sum_queue = 0.0
        self._guard_occ_prev = 0.0
        self.last_action_value_sec = float(self.green_time_actions_sec[0])
        self.backend.set_phase(RED_PHASE)
        self.backend.set_phase_duration(self.cfg.cycle_seconds)

        # ~5 s of warm-up stepping (reference rl_controller.py:165-173).
        dt = self.backend.sim_step_seconds
        n_init = int(round(max(1.0, 5.0 / dt))) if dt > 0 else 5
        for _ in range(n_init):
            if self.backend.is_end():
                break
            self.backend.step()
        self._collect_cycle_metrics()
        self._last_info = self._build_info(self.last_action_value_sec)
        return self.obs()

    def step(self, action_index: int):
        action_index = int(np.clip(action_index, 0, self.action_space_n - 1))
        # Env-side safety envelope (EnvConfig.guard_occ; 0 = off): cap the
        # green at guard_cap while the previous cycle's merge occupancy is
        # above guard_occ percent — the shared rule (guard.clamp), so a
        # policy can be TRAINED under the exact envelope it deploys with.
        action_index = int(guard.clamp(action_index, self._guard_occ_prev,
                                       self.cfg.guard_occ,
                                       int(self.cfg.guard_cap)))
        green_sec = float(self.green_time_actions_sec[action_index])
        self.last_action_value_sec = green_sec
        red_sec = max(0.0, self.cfg.cycle_seconds - green_sec)

        self._sum_queue = 0.0
        dt = self.backend.sim_step_seconds
        self._run_phase(GREEN_PHASE, green_sec, dt)
        self._run_phase(RED_PHASE, red_sec, dt)

        self._collect_cycle_metrics()
        self._guard_occ_prev = float(self.m.occ_bottleneck)
        obs = self.obs()
        reward = self.rew()
        terminated = self.done()
        self._last_info = self._build_info(green_sec)
        return obs, reward, terminated, self._last_info

    def _run_phase(self, phase: int, duration_sec: float, dt: float) -> None:
        if duration_sec <= 0:
            return
        self.backend.set_phase(phase)
        self.backend.set_phase_duration(duration_sec)
        n = int(round(duration_sec / dt)) if dt > 0 else int(duration_sec)
        for _ in range(n):
            if self.backend.is_end():
                break
            self.backend.step()
            self._sum_queue += self.backend.edge_vehicle_count(self.spec.on_ramp_edge)

    def close(self) -> None:
        self.backend.close()

    # ------------------------------------------------------------------
    # Observation (reference rl_controller.py:297-329 + variants)
    # ------------------------------------------------------------------
    def _norm(self, value: float, denom: float) -> float:
        return float(np.clip(value / (denom if denom > 0 else 1.0), 0.0, 1.0))

    def macro_state(self) -> np.ndarray:
        c, m = self.cfg, self.m
        base = [
            self._norm(m.flow_upstream_vph, c.max_flow_upstream_vph),
            self._norm(m.flow_merging_vph, c.max_flow_merging_vph),
            self._norm(m.occ_upstream, c.max_occupancy_percent),
            self._norm(m.speed_upstream, c.freeflow_speed_mps),
            self._norm(m.occ_bottleneck, c.max_occupancy_percent),
            self._norm(m.speed_bottleneck, c.freeflow_speed_mps),
            self._norm(m.ramp_queue_veh, c.max_ramp_queue_veh),
        ]
        if self.cfg.obs_variant == "macro_no_lane":
            # 8-dim variant ('macro no lane/rl_controller...' :301-311).
            return np.asarray(
                base + [self._norm(self.last_action_value_sec, c.cycle_seconds)],
                np.float32,
            )
        lane0 = [
            self._norm(m.flow_lane0_merging_vph, c.max_lane_flow_vph),
            self._norm(m.flow_lane0_upstream_vph, c.max_lane_flow_vph),
            self._norm(m.occ_lane0_bottleneck, c.max_occupancy_percent),
            self._norm(m.speed_lane0_bottleneck, c.freeflow_speed_mps),
            self._norm(m.occ_lane0_upstream, c.max_occupancy_percent),
            self._norm(m.speed_lane0_upstream, c.freeflow_speed_mps),
        ]
        return np.asarray(
            base + lane0 + [self._norm(self.last_action_value_sec, c.cycle_seconds)],
            np.float32,
        )

    def obs(self) -> np.ndarray:
        macro = self.macro_state()
        if self.cfg.obs_variant != "hybrid":
            return macro
        grid = build_grid(
            self.backend.vehicle_snapshot(), self.cfg.grid, self.spec,
            self.cfg.freeflow_speed_mps,
        )
        return np.concatenate([macro, flatten_grid(grid)])

    # ------------------------------------------------------------------
    # Reward (reference rl_controller.py:333-425)
    # ------------------------------------------------------------------
    def reward_components(self) -> dict:
        c, m = self.cfg, self.m
        r_speed_merge = self._norm(m.speed_bottleneck, c.freeflow_speed_mps)
        r_speed_up = self._norm(m.speed_upstream, c.freeflow_speed_mps)
        r_speed_down = self._norm(m.speed_downstream, c.freeflow_speed_mps)
        p_occ_bottle = -self._norm(m.occ_bottleneck, c.max_occupancy_percent)
        p_occ_up = -self._norm(m.occ_upstream, c.max_occupancy_percent)
        p_queue = -self._norm(m.ramp_queue_veh, c.max_ramp_queue_veh)

        threshold = c.spillback_threshold_frac * c.max_ramp_queue_veh
        if m.ramp_queue_veh > threshold:
            denom = max(c.max_ramp_queue_veh - threshold, 1e-6)
            p_spill = -float(np.clip((m.ramp_queue_veh - threshold) / denom, 0.0, 1.0))
        else:
            p_spill = 0.0

        n_lanes = self.backend.edge_lane_count(self.spec.downstream_edge)
        max_tp = c.max_lane_flow_vph * (n_lanes if n_lanes > 0 else 1)
        r_throughput = self._norm(m.flow_downstream_vph, max_tp)

        return {
            "r_speed_merge": r_speed_merge,
            "r_speed_up": r_speed_up,
            "r_speed_down": r_speed_down,
            "p_occ_bottle": p_occ_bottle,
            "p_occ_up": p_occ_up,
            "p_queue": p_queue,
            "p_spillback": p_spill,
            "r_throughput": r_throughput,
        }

    def rew(self) -> float:
        c = self.cfg
        rc = self.reward_components()
        return float(
            c.w_speed_merge * rc["r_speed_merge"]
            + c.w_speed_up * rc["r_speed_up"]
            + c.w_speed_down * rc["r_speed_down"]
            + c.w_occ_bottle * rc["p_occ_bottle"]
            + c.w_occ_upstream * rc["p_occ_up"]
            + c.w_queue * rc["p_queue"]
            + c.w_spillback * rc["p_spillback"]
        )

    def done(self) -> bool:
        return self.backend.is_end() or self.backend.time() >= self.cfg.scenario.episode_seconds

    # ------------------------------------------------------------------
    # Info dict (reference rl_controller.py:265-292) — exact key set.
    # ------------------------------------------------------------------
    def _build_info(self, chosen_green_sec: float) -> dict:
        m = self.m
        rc = self.reward_components()
        info = {
            "mainline_flow_upstream_v/h": m.flow_upstream_vph,
            "mainline_occ_upstream_percent": m.occ_upstream,
            "mainline_speed_upstream_km/h": m.speed_upstream,
            "mainline_flow_mergeArea_v/h": m.flow_merging_vph,
            "mainline_occ_mergeArea_percent": m.occ_bottleneck,
            "mainline_speed_mergeArea_km/h": m.speed_bottleneck,
            "mainline_flow_downstream_v/h": m.flow_downstream_vph,
            "mainline_speed_downstream_km/h": m.speed_downstream,
            "mainline_occ_downstream_percent": m.occ_downstream,
            "ramp_queue_veh": m.ramp_queue_veh,
            "current_tl_phase_index": self.backend.get_phase(),
            "current_tl_ryg_state": self.backend.get_ryg_state(),
            "chosen_green_time_sec": chosen_green_sec,
            "reward_outflow_speed_comp": rc["r_speed_down"],
            "reward_throughput_comp": rc["r_throughput"],
            "penalty_ramp_queue_comp": rc["p_queue"],
            "penalty_bottleneck_occ_comp": rc["p_occ_bottle"],
            "penalty_spillback_comp": rc["p_spillback"],
            "sim_time": self.backend.time(),
            "episode": self._ep_count,
            **self.backend.scenario_info(),
            **self.backend.sim_stats(),
        }
        return info

    def info(self) -> dict:
        return self._last_info

    def get_scenario_info(self) -> dict:
        return self.backend.scenario_info()
