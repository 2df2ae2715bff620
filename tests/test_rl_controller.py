"""RampMeterEnv MDP semantics (reference rl_controller.py:7-452)."""

import numpy as np
import pytest

from multimodal_drl_rmc_tpu.config import EnvConfig, ScenarioConfig
from multimodal_drl_rmc_tpu.envs import (
    GREEN_PHASE,
    RED_PHASE,
    FakeTrafficBackend,
    RampMeterEnv,
)

SHORT = ScenarioConfig(episode_seconds=200.0)


class SpyBackend(FakeTrafficBackend):
    """Records the phase active during every sim step."""

    def reset(self, seed=None):
        super().reset(seed)
        self.phase_trace = []

    def step(self):
        self.phase_trace.append(self.get_phase())
        super().step()


def make_env(variant="hybrid", backend_cls=FakeTrafficBackend):
    cfg = EnvConfig(scenario=SHORT, obs_variant=variant)
    return RampMeterEnv(backend_cls(cfg.scenario), cfg)


def test_reset_warmup_and_obs_shape():
    env = make_env(backend_cls=SpyBackend)
    obs = env.reset(seed=3)
    assert obs.shape == (14 + 270,)
    assert obs.dtype == np.float32
    # ~5 s of warm-up stepping under red (rl_controller.py:161-173).
    assert len(env.backend.phase_trace) == 5
    assert all(p == RED_PHASE for p in env.backend.phase_trace)


def test_cycle_green_red_split():
    env = make_env(backend_cls=SpyBackend)
    env.reset(seed=3)
    env.backend.phase_trace = []
    env.step(0)  # 5 s green
    trace = env.backend.phase_trace
    assert len(trace) == 40
    assert trace[:5] == [GREEN_PHASE] * 5
    assert trace[5:] == [RED_PHASE] * 35
    env.backend.phase_trace = []
    env.step(7)  # 40 s green -> no red steps
    assert env.backend.phase_trace == [GREEN_PHASE] * 40


def test_action_clamping():
    env = make_env()
    env.reset(seed=0)
    _, _, _, info = env.step(99)
    assert info["chosen_green_time_sec"] == 40.0
    _, _, _, info = env.step(-5)
    assert info["chosen_green_time_sec"] == 5.0


def test_done_at_episode_end():
    env = make_env()
    env.reset(seed=0)
    dones = []
    for _ in range(6):
        _, _, done, _ = env.step(3)
        dones.append(done)
        if done:
            break
    # 5 warmup + 5 cycles * 40 s >= 200 s -> done on the 5th step.
    assert dones[-1]
    assert len(dones) == 5


def test_reward_formula_hand_computed():
    env = make_env()
    env.reset(seed=0)
    m = env.m
    m.speed_bottleneck = 17.5   # /35 -> 0.5
    m.speed_upstream = 35.0     # -> 1.0
    m.speed_downstream = 7.0    # -> 0.2
    m.occ_bottleneck = 50.0     # -> 0.5
    m.occ_upstream = 10.0       # -> 0.1
    m.ramp_queue_veh = 5.0      # /25 -> 0.2
    expected = 1.5 * 0.5 + 1.0 * 1.0 + 0.5 * 0.2 - 2.0 * 0.5 - 1.0 * 0.1 - 1.0 * 0.2
    assert env.rew() == pytest.approx(expected)


def test_spillback_penalty_graded_and_saturating():
    env = make_env()
    env.reset(seed=0)
    m = env.m
    m.speed_bottleneck = m.speed_upstream = m.speed_downstream = 0.0
    m.occ_bottleneck = m.occ_upstream = 0.0
    # threshold = 0.9 * 25 = 22.5
    m.ramp_queue_veh = 22.5
    assert env.reward_components()["p_spillback"] == 0.0
    m.ramp_queue_veh = 23.75  # halfway into the zone
    assert env.reward_components()["p_spillback"] == pytest.approx(-0.5)
    m.ramp_queue_veh = 40.0   # saturates at -1
    assert env.reward_components()["p_spillback"] == -1.0
    base_queue = -1.0 * min(1.0, 40.0 / 25.0)
    assert env.rew() == pytest.approx(1.0 * base_queue + 20.0 * -1.0)


def test_macro_state_variants():
    for variant, size in (("hybrid", 14), ("macro_lane", 14), ("macro_no_lane", 8)):
        env = make_env(variant)
        env.reset(seed=1)
        macro = env.macro_state()
        assert macro.shape == (size,)
        assert np.all(macro >= 0.0) and np.all(macro <= 1.0)
        obs = env.obs()
        assert obs.shape == (env.observation_space_n,)
        # Last macro feature is the normalized previous action.
        assert macro[-1] == pytest.approx(env.last_action_value_sec / 40.0)


def test_info_keys_match_reference_schema():
    env = make_env()
    env.reset(seed=0)
    _, _, _, info = env.step(2)
    expected = {
        "mainline_flow_upstream_v/h", "mainline_occ_upstream_percent",
        "mainline_speed_upstream_km/h", "mainline_flow_mergeArea_v/h",
        "mainline_occ_mergeArea_percent", "mainline_speed_mergeArea_km/h",
        "mainline_flow_downstream_v/h", "mainline_speed_downstream_km/h",
        "mainline_occ_downstream_percent", "ramp_queue_veh",
        "current_tl_phase_index", "current_tl_ryg_state",
        "chosen_green_time_sec", "reward_outflow_speed_comp",
        "reward_throughput_comp", "penalty_ramp_queue_comp",
        "penalty_bottleneck_occ_comp", "penalty_spillback_comp",
        "sim_time", "episode", "main_flow_vph", "on_ramp_flow_vph",
        "off_ramp_flow_vph", "con_penetration_rate",
        "total_running_vehicles", "total_departed", "total_arrived",
    }
    assert expected <= set(info.keys())
    assert info["chosen_green_time_sec"] == 15.0


def test_queue_metric_is_cycle_average():
    env = make_env(backend_cls=SpyBackend)
    env.reset(seed=3)
    env.step(0)  # mostly red -> queue builds
    q_red = env.m.ramp_queue_veh
    env2 = make_env(backend_cls=SpyBackend)
    env2.reset(seed=3)
    for _ in range(3):
        env2.step(7)  # all green -> queue drains
    assert env2.m.ramp_queue_veh <= q_red


def test_determinism_given_seed():
    a = make_env()
    b = make_env()
    oa = a.reset(seed=11)
    ob = b.reset(seed=11)
    np.testing.assert_array_equal(oa, ob)
    sa = a.step(4)
    sb = b.step(4)
    np.testing.assert_array_equal(sa[0], sb[0])
    assert sa[1] == sb[1]
