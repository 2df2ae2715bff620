"""Classical ramp-metering controllers (evaluation oracles).

Behavioral port target: reference ``env/custom_env/baselines.py`` —
AlwaysGreen (:80-89), FixedCycle 20 s/20 s (:93-132), ALINEA occupancy
feedback with KR=60, occ_crit=17 %, rate in [180, 1900] vph (:135-192), and
PI-ALINEA with KP=60, KI=10 and conditional anti-windup (:195-253). All step
the simulator one sim step per ``step()`` call (1 Hz control), unlike the
RL controller's 40 s macro step — matching the reference's Play loop
(play.py:34-59).

The controllers are pure host logic over the ``TrafficBackend`` protocol;
no simulator-specific code.
"""

from __future__ import annotations

import numpy as np

from ..config import EnvConfig
from .backend import (
    GREEN_PHASE,
    RED_PHASE,
    TrafficBackend,
    loops_flow_vph,
    loops_flow_weighted_speed,
    loops_occupancy_percent,
)


class BaselineController:
    """Common scaffolding (reference BaselineMeta, baselines.py:7-77)."""

    def __init__(self, backend: TrafficBackend, cfg: EnvConfig | None = None, log: bool = True):
        self.backend = backend
        self.cfg = cfg or EnvConfig()
        self.log = log
        self.spec = backend.spec
        self.action_space_n = 1
        self.observation_space_n = 1
        self.us_loops = list(self.spec.upstream_state_loops)
        self.ma_loops = list(self.spec.bottleneck_state_loops)
        self.ds_loops = list(self.spec.downstream_loops)
        self._last_info: dict = {}
        self._ep_count = 0

    # -- MDP facade --------------------------------------------------------
    def obs(self):
        return np.zeros((1,), np.float32)

    def rew(self) -> float:
        return 0.0

    def done(self) -> bool:
        return self.backend.is_end() or self.backend.time() >= self.cfg.scenario.episode_seconds

    def info(self) -> dict:
        return self._last_info

    def reset(self, seed: int | None = None):
        raise NotImplementedError

    def step(self, action=None):
        raise NotImplementedError

    def close(self) -> None:
        self.backend.close()

    def get_scenario_info(self) -> dict:
        return self.backend.scenario_info()

    def _base_reset(self, seed: int | None) -> None:
        self.backend.reset(seed)
        self._ep_count += 1

    # -- metrics (reference _collect_common_metrics, baselines.py:54-74) ---
    def _collect_common_metrics(self) -> dict:
        b = self.backend
        period = self.cfg.cycle_seconds
        metrics = {
            "sim_time": b.time(),
            "episode": self._ep_count,
            **b.scenario_info(),
            **b.sim_stats(),
            "mainline_flow_upstream_v/h": loops_flow_vph(b, self.us_loops, period),
            "mainline_occ_upstream_percent": loops_occupancy_percent(b, self.us_loops),
            "mainline_speed_upstream_km/h": loops_flow_weighted_speed(b, self.us_loops),
            "mainline_flow_mergeArea_v/h": loops_flow_vph(b, self.ma_loops, period),
            "mainline_occ_mergeArea_percent": loops_occupancy_percent(b, self.ma_loops),
            "mainline_speed_mergeArea_km/h": loops_flow_weighted_speed(b, self.ma_loops),
            "mainline_flow_downstream_v/h": loops_flow_vph(b, self.ds_loops, period),
            "mainline_occ_downstream_percent": loops_occupancy_percent(b, self.ds_loops),
            "mainline_speed_downstream_km/h": loops_flow_weighted_speed(b, self.ds_loops),
            "ramp_queue_veh": b.edge_vehicle_count(self.spec.on_ramp_edge),
            "current_tl_phase_index": b.get_phase(),
            "current_tl_ryg_state": b.get_ryg_state(),
        }
        return metrics

    def _update_log_info(self) -> None:
        self._last_info = self._collect_common_metrics()


class AlwaysGreenBaseline(BaselineController):
    """No control: meter always green (reference baselines.py:80-89)."""

    def reset(self, seed: int | None = None):
        self._base_reset(seed)
        self.backend.set_phase(GREEN_PHASE)
        self._update_log_info()
        return self.obs()

    def step(self, action=None):
        self.backend.step()
        self._update_log_info()
        return self.obs(), self.rew(), self.done(), self._last_info


class FixedCycleBaseline(BaselineController):
    """Fixed 20 s green / 20 s red (reference baselines.py:93-132)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.tg_sec = 20.0
        self.tr_sec = 20.0
        self.time_in_phase_sec = 0.0
        self.is_green = True

    def reset(self, seed: int | None = None):
        self._base_reset(seed)
        self.time_in_phase_sec = 0.0
        self.is_green = True
        self.backend.set_phase(GREEN_PHASE)
        self._update_log_info()
        return self.obs()

    def step(self, action=None):
        if self.is_green and self.time_in_phase_sec >= self.tg_sec:
            self.backend.set_phase(RED_PHASE)
            self.is_green = False
            self.time_in_phase_sec = 0.0
        elif not self.is_green and self.time_in_phase_sec >= self.tr_sec:
            self.backend.set_phase(GREEN_PHASE)
            self.is_green = True
            self.time_in_phase_sec = 0.0
        self.backend.step()
        self.time_in_phase_sec += self.backend.sim_step_seconds
        self._update_log_info()
        return self.obs(), self.rew(), self.done(), self._last_info

    def _update_log_info(self) -> None:
        super()._update_log_info()
        self._last_info.update({
            "baseline_specific_action": "FixedCycle",
            "fixed_cycle_is_green": self.is_green,
            "fixed_cycle_time_in_phase": self.time_in_phase_sec,
        })


class AlineaDsBaseline(BaselineController):
    """ALINEA occupancy-feedback metering (reference baselines.py:135-192).

    rate += KR * (occ_crit - occ_measured), clipped to [180, 1900] vph;
    green time = vehicles-per-cycle / saturation flow, in [3 s, cycle].
    """

    KIND = "alinea"

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.CYCLE_LENGTH_SEC = self.cfg.cycle_seconds
        self.CRITICAL_OCCUPANCY_PERCENT = 17.0
        self.KR = 60.0
        self.MIN_METERING_RATE_VPH = 180.0
        self.MAX_METERING_RATE_VPH = 1900.0
        self.MIN_GREEN_TIME_SEC = 3.0
        self.RAMP_SATURATION_FLOW_VPS = 0.5
        self.time_in_cycle_sec = 0.0
        self.active_green_time_sec = 0.0
        self.current_metering_rate_vph = 0.0
        self.measured_downstream_occ = 0.0

    def reset(self, seed: int | None = None):
        self._base_reset(seed)
        self.current_metering_rate_vph = (
            self.MAX_METERING_RATE_VPH + self.MIN_METERING_RATE_VPH
        ) / 2
        self.time_in_cycle_sec = self.CYCLE_LENGTH_SEC  # force rate calc on first step
        self.active_green_time_sec = self.MIN_GREEN_TIME_SEC
        self.measured_downstream_occ = 0.0
        self._update_log_info()
        return self.obs()

    def _measure_occupancy(self) -> float:
        occ = loops_occupancy_percent(self.backend, self.ma_loops)
        self.measured_downstream_occ = occ
        return occ

    def _update_rate(self, occ_error: float) -> None:
        new_rate = self.current_metering_rate_vph + self.KR * occ_error
        self.current_metering_rate_vph = float(
            np.clip(new_rate, self.MIN_METERING_RATE_VPH, self.MAX_METERING_RATE_VPH)
        )

    def _calculate_new_cycle_times(self) -> None:
        occ_error = self.CRITICAL_OCCUPANCY_PERCENT - self._measure_occupancy()
        self._update_rate(occ_error)
        vehs_per_cycle = self.current_metering_rate_vph * (self.CYCLE_LENGTH_SEC / 3600.0)
        tg = vehs_per_cycle / self.RAMP_SATURATION_FLOW_VPS
        self.active_green_time_sec = float(
            np.clip(tg, self.MIN_GREEN_TIME_SEC, self.CYCLE_LENGTH_SEC)
        )

    def step(self, action=None):
        if self.time_in_cycle_sec >= self.CYCLE_LENGTH_SEC:
            self._calculate_new_cycle_times()
            self.time_in_cycle_sec = 0.0
        if self.time_in_cycle_sec < self.active_green_time_sec:
            if self.backend.get_phase() != GREEN_PHASE:
                self.backend.set_phase(GREEN_PHASE)
        else:
            if self.backend.get_phase() != RED_PHASE:
                self.backend.set_phase(RED_PHASE)
        self.backend.step()
        self.time_in_cycle_sec += self.backend.sim_step_seconds
        self._update_log_info()
        return self.obs(), self.rew(), self.done(), self._last_info

    def _update_log_info(self) -> None:
        super()._update_log_info()
        k = self.KIND
        self._last_info.update({
            "baseline_specific_action": "Alinea" if k == "alinea" else "PiAlinea",
            f"{k}_measured_downstream_occ_percent": self.measured_downstream_occ,
            f"{k}_current_metering_rate_vph": self.current_metering_rate_vph,
            f"{k}_target_green_time_sec": self.active_green_time_sec,
            f"{k}_target_red_time_sec": self.CYCLE_LENGTH_SEC - self.active_green_time_sec,
        })


class PiAlineaDsBaseline(AlineaDsBaseline):
    """PI-ALINEA: proportional + integral with conditional anti-windup
    (reference baselines.py:195-253). Note the reference caps this variant's
    rate at 1800 vph (vs ALINEA's 1900)."""

    KIND = "pialinea"

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.KP = 60.0
        self.KI = 10.0
        self.MAX_METERING_RATE_VPH = 1800.0
        self.integral_term = 0.0

    def reset(self, seed: int | None = None):
        self.integral_term = 0.0
        return super().reset(seed)

    def _update_rate(self, occ_error: float) -> None:
        self.integral_term += occ_error
        rate_change = self.KP * occ_error + self.KI * self.integral_term
        new_rate = self.current_metering_rate_vph + rate_change
        # Anti-windup: back the integral out when the actuator saturates.
        if new_rate > self.MAX_METERING_RATE_VPH or new_rate < self.MIN_METERING_RATE_VPH:
            self.integral_term -= occ_error
        self.current_metering_rate_vph = float(
            np.clip(new_rate, self.MIN_METERING_RATE_VPH, self.MAX_METERING_RATE_VPH)
        )


BASELINES = {
    "AlwaysGreenBaseline": AlwaysGreenBaseline,
    "FixedCycleBaseline": FixedCycleBaseline,
    "AlineaDsBaseline": AlineaDsBaseline,
    "PiAlineaDsBaseline": PiAlineaDsBaseline,
}
