"""Adapter + gym wrapper + vec env integration (reference dqn_env.py,
env_wrap.py, env_make.py, baselines_wrappers/)."""

import csv
import os

import numpy as np

from multimodal_drl_rmc_tpu.config import Config, EnvConfig, ScenarioConfig
from multimodal_drl_rmc_tpu.envs import (
    FakeTrafficBackend,
    GymEnvWrapper,
    RampEnv,
    make_env,
)

SHORT_CFG = Config(env=EnvConfig(scenario=ScenarioConfig(episode_seconds=200.0)))


def make_wrapped(mode="train", player=None):
    return GymEnvWrapper(RampEnv(mode, player, cfg=SHORT_CFG, backend="fake"))


def test_adapter_modes():
    train = RampEnv("train", cfg=SHORT_CFG, backend="fake")
    assert train.action_space_n == 8
    assert train.observation_space_n == 284
    play = RampEnv("play", "AlineaDsBaseline", cfg=SHORT_CFG, backend="fake")
    assert play.action_space_n == 1
    test_player = RampEnv("play", "Test", cfg=SHORT_CFG, backend="fake")
    assert test_player.action_space_n == 8


def test_wrapper_gymnasium_api():
    env = make_wrapped("observe")
    obs, info = env.reset(seed=5)
    assert obs.shape == env.observation_space.shape
    assert obs.dtype == np.float32
    assert info["l"] == 0 and info["r"] == 0.0
    total = 0.0
    for i in range(3):
        obs, rew, terminated, truncated, info = env.step(i)
        total += rew
        assert obs.shape == env.observation_space.shape
        assert isinstance(terminated, bool) and isinstance(truncated, bool)
    assert info["l"] == 3
    assert info["r"] == total
    assert "mainline_flow_upstream_v/h" in info  # observe mode -> detailed


def test_wrapper_train_mode_lean_info():
    env = make_wrapped("train")
    env.reset(seed=0)
    _, _, _, _, info = env.step(0)
    assert set(info.keys()) == {"l", "r"}


def test_log_info_writer_csv(tmp_path):
    env = make_wrapped("observe")
    env.reset(seed=1)
    path = str(tmp_path / "framework_log")
    done = False
    while not done:
        _, _, terminated, truncated, info = env.step(3)
        done = terminated or truncated
        env.log_info_writer(info, done, True, 1, path)
    assert os.path.isfile(path)
    with open(path) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 5  # 200 s / 40 s cycles
    assert "ramp_queue_veh" in rows[0]
    assert "sim_time" in rows[0]
    assert rows[-1]["done"] == "True"


def test_vec_env_serial_and_threaded():
    def factory():
        return make_wrapped("train")

    for threaded in (False, True):
        vec = make_env(factory, n_env=2, threaded=threaded)
        obses = vec.reset(seed=7)
        assert obses.shape == (2, 284)
        obs, rew, term, trunc, infos = vec.step([0, 7])
        assert obs.shape == (2, 284)
        assert rew.shape == (2,)
        assert term.shape == (2,) and trunc.shape == (2,)
        assert len(infos) == 2
        vec.close()


def test_vec_env_auto_reset():
    def factory():
        return make_wrapped("train")

    vec = make_env(factory, n_env=1, threaded=False)
    vec.reset(seed=0)
    saw_done = False
    for _ in range(7):
        obs, _, term, trunc, infos = vec.step([3])
        if term[0] or trunc[0]:
            saw_done = True
            assert "final_obs" in infos[0]
            assert obs.shape == (1, 284)  # fresh obs from auto-reset
            break
    assert saw_done
    vec.close()


def test_max_episode_steps_wrapper():
    def factory():
        return make_wrapped("train")

    env = make_env(factory, max_episode_steps=2, n_env=0)
    env.reset(seed=0)
    _, _, term, trunc, _ = env.step(0)
    assert not trunc
    _, _, term, trunc, info = env.step(0)
    assert trunc and not term
    assert info["TimeLimit.truncated"] is True


def _proc_factory():
    # Runs inside the spawned worker: force CPU before any jax use (the
    # axon sitecustomize would otherwise grab the TPU in the child).
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
    return make_wrapped("train")


def test_vec_env_process_workers():
    """ProcessVecEnv (reference SubprocVecEnv, subproc_vec_env.py:7-129):
    spawn-context pipe workers run real episodes with auto-reset and the
    gymnasium 5-tuple — the GIL-free path for libsumo / CPU-bound envs."""
    from multimodal_drl_rmc_tpu.envs.vector import ProcessVecEnv

    vec = make_env(_proc_factory, n_env=2, vec="process")
    assert isinstance(vec, ProcessVecEnv)
    try:
        obses = vec.reset(seed=7)
        assert obses.shape == (2, 284)
        assert vec.action_space.n == 8
        saw_done = False
        for _ in range(6):
            obs, rew, term, trunc, infos = vec.step([3, 5])
            assert obs.shape == (2, 284)
            assert rew.shape == (2,) and len(infos) == 2
            if term[0] or trunc[0]:
                saw_done = True
                assert "final_obs" in infos[0]
                assert "episode" in infos[0]  # Monitor stats
                break
        assert saw_done  # 200 s episode = 5 cycles
    finally:
        vec.close()
    assert all(not p.is_alive() for p in vec.procs)


def test_vec_env_process_close_idempotent_and_asserts():
    import pytest as _pytest

    vec = make_env(_proc_factory, n_env=1, vec="process")
    vec.close()
    vec.close()  # idempotent
    with _pytest.raises(AssertionError):
        vec.step([0])
