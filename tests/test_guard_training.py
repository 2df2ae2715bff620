"""Guard-in-the-loop training: the env-side safety envelope.

Round 4 shipped the safety envelope as a RUNTIME patch (PolicyRunner
guard_occ/guard_cap, runtime/rollout.py:92-96; DeviceEvaluator guard,
sim/eval_on_device.py). These tests pin its TRAINING-TIME twin
(EnvConfig.guard_occ/guard_cap):

* the host env's internal clamp is step-for-step identical to wrapping
  an unguarded env with the PolicyRunner clamp rule (so "guard-trained"
  and "guard-wrapped" mean the same envelope, and the two
  implementations cannot drift);
* the device trainers clamp what the env executes AND what replay
  stores, using obs feature 4 — which is pinned here to equal the
  previous cycle's merge occupancy that the DeviceEvaluator guard keys
  on (m.occ_bottleneck);
* guard thresholds that can never fire leave training bit-identical to
  guard-off (the flag is free when unused).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_drl_rmc_tpu.config import (
    Config, EnvConfig, HyperParams, ScenarioConfig,
)

SHORT = ScenarioConfig(episode_seconds=400.0)


def _mk_env(guard_occ=0.0, guard_cap=1):
    from multimodal_drl_rmc_tpu.envs import RampEnv

    cfg = Config(env=EnvConfig(scenario=SHORT, guard_occ=guard_occ,
                               guard_cap=guard_cap))
    return RampEnv("observe", cfg=cfg, backend="fake")


def test_env_guard_matches_policyrunner_clamp():
    """Env-side guard == PolicyRunner clamp rule applied outside the env.

    Drive a guarded env with RAW actions and an unguarded env with
    actions pre-clamped by the PolicyRunner rule (cap while the PREVIOUS
    step's info occ > threshold, first action unguarded); every obs,
    reward and info must match exactly.
    """
    # Pick a threshold the fake backend actually crosses: median of the
    # positive occupancies from an unguarded probe episode.
    probe = _mk_env()
    probe.reset(seed=7)
    occs = []
    done = False
    while not done:
        _, _, done, info = probe.step(7)
        occs.append(info["mainline_occ_mergeArea_percent"])
    probe.close()
    occs = np.asarray(occs)
    assert (occs > 0).any(), "fake backend produced zero occupancy"
    thr = float(np.median(occs[occs > 0]))

    guarded = _mk_env(guard_occ=thr, guard_cap=1)
    plain = _mk_env()
    og = guarded.reset(seed=7)
    op = plain.reset(seed=7)
    np.testing.assert_array_equal(og, op)

    last_occ = 0.0  # PolicyRunner._last_occ reset semantics
    done = False
    n_clamped = 0
    while not done:
        raw = 7  # always ask for the longest green => clamps are visible
        runner_a = min(raw, 1) if last_occ > thr else raw
        n_clamped += runner_a != raw
        og, rg, dg, ig = guarded.step(raw)
        op, rp, dp, ip = plain.step(runner_a)
        np.testing.assert_array_equal(og, op)
        assert rg == rp and dg == dp
        assert ig["chosen_green_time_sec"] == ip["chosen_green_time_sec"]
        assert (ig["mainline_occ_mergeArea_percent"]
                == ip["mainline_occ_mergeArea_percent"])
        last_occ = float(ip["mainline_occ_mergeArea_percent"])
        done = dg
    guarded.close()
    plain.close()
    assert n_clamped > 0, "guard never fired — test exercised nothing"


def test_device_obs_feature4_is_prev_cycle_merge_occ():
    """obs[4] * max_occupancy_percent == m.occ_bottleneck of the cycle
    that produced it — the trainer guard (keyed on obs[4]) and the
    DeviceEvaluator guard (keyed on the m.occ_bottleneck series,
    sim/eval_on_device.py) trigger on the same quantity."""
    from multimodal_drl_rmc_tpu.sim.env import DeviceRampEnv

    env_cfg = EnvConfig(scenario=ScenarioConfig(episode_seconds=4000.0))
    env = DeviceRampEnv(env_cfg, 4)
    states, obs = env.reset(jax.random.PRNGKey(3))
    for i in range(4):
        acts = jnp.full((4,), 7, jnp.int32)
        states, (obs_final, obs_next, _r, done, m) = env.step(states, acts)
        assert not bool(done.any())  # long episode: obs_next == obs_final
        np.testing.assert_allclose(
            np.asarray(obs_final[:, 4]) * env_cfg.max_occupancy_percent,
            np.clip(np.asarray(m.occ_bottleneck), 0.0,
                    env_cfg.max_occupancy_percent),
            rtol=1e-5, atol=1e-5)
        obs = obs_next


def _tiny_cfg(guard_occ=0.0, guard_cap=1, **hp_kw):
    kw = dict(batch_size=8, min_mem=16, max_mem=512,
              max_total_steps=0, load=False)
    kw.update(hp_kw)
    return Config(
        env=EnvConfig(scenario=ScenarioConfig(episode_seconds=400.0),
                      guard_occ=guard_occ, guard_cap=guard_cap),
        hp=HyperParams(**kw),
    )


def _run_chunks(cfg, warm=6, train=2):
    from multimodal_drl_rmc_tpu.sim.train_on_device import DeviceTrainer

    tr = DeviceTrainer(cfg, batch=4, replay_ratio=1.0)
    carry = tr.init_carry()
    carry = tr._warm_chunk(carry, warm)
    for _ in range(train):
        carry, out = tr._train_chunk(carry)
    return carry, out


@pytest.mark.slow
def test_device_trainer_guard_never_firing_is_bit_identical():
    c0, o0 = _run_chunks(_tiny_cfg(guard_occ=0.0))
    c1, o1 = _run_chunks(_tiny_cfg(guard_occ=1000.0))
    np.testing.assert_array_equal(np.asarray(c0.obs), np.asarray(c1.obs))
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        c0.train_state.params, c1.train_state.params)
    assert float(o0["loss"]) == float(o1["loss"])


def test_device_trainer_guard_caps_replay_actions():
    """With the guard in the loop, replay holds the EXECUTED (clamped)
    actions: every stored transition whose obs says occ > threshold has
    action <= cap. Warmup random actions are clamped too (the envelope
    is env-side, not policy-side)."""
    guard_occ, cap = 0.5, 1
    cfg = _tiny_cfg(guard_occ=guard_occ, guard_cap=cap)
    carry, _ = _run_chunks(cfg, warm=8, train=2)
    buf = carry.buffer
    data = getattr(buf, "data", buf)
    n = int(data.size)
    assert n > 0
    obs = np.asarray(data.obs[:n], np.float32)
    act = np.asarray(data.action[:n])
    thr = guard_occ / cfg.env.max_occupancy_percent
    hot = obs[:, 4] > thr
    assert hot.any(), "threshold never crossed — test exercised nothing"
    assert (act[hot] <= cap).all(), (
        f"{(act[hot] > cap).sum()} stored actions exceed the guard cap")
    # Sanity: unguarded slots do explore above the cap.
    assert (act[~hot] > cap).any()


def test_train_cli_guard_flags_reach_env_config():
    from multimodal_drl_rmc_tpu.runtime.train import (
        add_common_args, build_config,
    )
    import argparse

    p = argparse.ArgumentParser()
    add_common_args(p, HyperParams())
    args = p.parse_args(["-guard_occ", "20", "-guard_cap", "1"])
    cfg = build_config(args)
    assert cfg.env.guard_occ == 20.0
    assert cfg.env.guard_cap == 1
    # Default stays off.
    cfg0 = build_config(p.parse_args([]))
    assert cfg0.env.guard_occ == 0.0
