"""Baseline controller laws (reference baselines.py:80-253)."""

import pytest

from multimodal_drl_rmc_tpu.config import EnvConfig, ScenarioConfig
from multimodal_drl_rmc_tpu.envs import (
    GREEN_PHASE,
    RED_PHASE,
    AlineaDsBaseline,
    AlwaysGreenBaseline,
    FakeTrafficBackend,
    FixedCycleBaseline,
    PiAlineaDsBaseline,
)

SHORT = ScenarioConfig(episode_seconds=120.0)


class FixedOccBackend(FakeTrafficBackend):
    """Backend reporting a fixed interval occupancy on every loop."""

    fixed_occ = 10.0

    def interval_occupancy(self, loop_id):
        return self.fixed_occ


def make(cls, backend_cls=FakeTrafficBackend):
    cfg = EnvConfig(scenario=SHORT)
    return cls(backend_cls(cfg.scenario), cfg)


def test_always_green_stays_green():
    c = make(AlwaysGreenBaseline)
    c.reset(seed=0)
    for _ in range(10):
        _, _, done, info = c.step()
        assert c.backend.get_phase() == GREEN_PHASE
    assert info["current_tl_ryg_state"] == "G"


def test_fixed_cycle_toggles_every_20s():
    c = make(FixedCycleBaseline)
    c.reset(seed=0)
    phases = []
    for _ in range(80):
        c.step()
        phases.append(c.backend.get_phase())
    # Steps 0..19 green, 20..39 red, 40..59 green, ...
    assert phases[:20] == [GREEN_PHASE] * 20
    assert phases[20:40] == [RED_PHASE] * 20
    assert phases[40:60] == [GREEN_PHASE] * 20


def test_alinea_rate_update_hand_computed():
    c = make(AlineaDsBaseline, FixedOccBackend)
    c.backend.fixed_occ = 10.0
    c.reset(seed=0)
    assert c.current_metering_rate_vph == pytest.approx((1900 + 180) / 2)  # 1040
    c.step()  # first step triggers the cycle-boundary rate update
    # rate = 1040 + 60 * (17 - 10) = 1460
    assert c.current_metering_rate_vph == pytest.approx(1460.0)
    # green = 1460 * (40/3600) / 0.5 = 32.44 s
    assert c.active_green_time_sec == pytest.approx(1460 * 40 / 3600 / 0.5)


def test_alinea_rate_clipping():
    c = make(AlineaDsBaseline, FixedOccBackend)
    c.backend.fixed_occ = 0.0   # huge positive error -> clip at max
    c.reset(seed=0)
    c.step()
    assert c.current_metering_rate_vph == 1900.0
    assert c.active_green_time_sec == pytest.approx(
        min(40.0, 1900 * 40 / 3600 / 0.5)
    )
    c2 = make(AlineaDsBaseline, FixedOccBackend)
    c2.backend.fixed_occ = 100.0  # big negative error -> clip at min
    c2.reset(seed=0)
    c2.step()
    assert c2.current_metering_rate_vph == 180.0
    assert c2.active_green_time_sec == pytest.approx(
        max(3.0, 180 * 40 / 3600 / 0.5)
    )


def test_alinea_green_phase_schedule_within_cycle():
    c = make(AlineaDsBaseline, FixedOccBackend)
    c.backend.fixed_occ = 100.0  # min rate -> green 4 s
    c.reset(seed=0)
    phases = []
    for _ in range(40):
        c.step()
        phases.append(c.backend.get_phase())
    g = int(round(c.active_green_time_sec))
    assert phases[:g] == [GREEN_PHASE] * g
    assert phases[g:40] == [RED_PHASE] * (40 - g)


def test_pi_alinea_integral_and_antiwindup():
    c = make(PiAlineaDsBaseline, FixedOccBackend)
    c.backend.fixed_occ = 16.0  # error = +1 each cycle
    c.reset(seed=0)
    c.step()
    # PI midpoint start = (1800+180)/2 = 990.
    # cycle 1: I=1, rate = 990 + 60*1 + 10*1 = 1060
    assert c.integral_term == pytest.approx(1.0)
    assert c.current_metering_rate_vph == pytest.approx(1060.0)
    for _ in range(40):
        c.step()
    # cycle 2: I=2, rate = 1060 + 60 + 20 = 1140
    assert c.integral_term == pytest.approx(2.0)
    assert c.current_metering_rate_vph == pytest.approx(1140.0)


def test_pi_alinea_antiwindup_on_saturation():
    c = make(PiAlineaDsBaseline, FixedOccBackend)
    c.backend.fixed_occ = 0.0  # error = +17, saturates instantly
    c.reset(seed=0)
    c.step()
    assert c.current_metering_rate_vph == 1800.0  # PI cap is 1800
    assert c.integral_term == pytest.approx(0.0)  # wound back


def test_baseline_info_schema():
    c = make(AlineaDsBaseline, FixedOccBackend)
    c.reset(seed=0)
    _, _, _, info = c.step()
    for key in (
        "mainline_flow_upstream_v/h", "mainline_occ_mergeArea_percent",
        "ramp_queue_veh", "baseline_specific_action",
        "alinea_current_metering_rate_vph", "alinea_target_green_time_sec",
    ):
        assert key in info
    assert info["baseline_specific_action"] == "Alinea"
