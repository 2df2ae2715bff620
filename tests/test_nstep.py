"""n-step return accumulation (ops/nstep.py; HyperParams.n_step)."""

import numpy as np
import pytest

from multimodal_drl_rmc_tpu.ops.nstep import NStepAccumulator


def push1(acc, obs, a, r, done, nobs, trunc=False):
    return acc.push(
        np.asarray([[obs]], np.float32), np.asarray([a]), np.asarray([r]),
        np.asarray([done]), np.asarray([[nobs]], np.float32),
        truncated=np.asarray([trunc]),
    )


def test_three_step_return_hand_computed():
    g = 0.9
    acc = NStepAccumulator(3, g, 1)
    assert push1(acc, 0.0, 0, 1.0, False, 1.0) is None
    assert push1(acc, 1.0, 1, 2.0, False, 2.0) is None
    b = push1(acc, 2.0, 2, 4.0, False, 3.0)
    # First transition matures: R = 1 + 0.9*2 + 0.81*4 = 6.04
    assert b is not None and b.obs.shape[0] == 1
    assert b.reward[0] == pytest.approx(1.0 + g * 2.0 + g * g * 4.0)
    assert b.obs[0, 0] == 0.0 and b.next_obs[0, 0] == 3.0
    assert b.action[0] == 0 and b.done[0] == 0.0
    # Next step matures the second transition: R = 2 + 0.9*4 + 0.81*8
    b = push1(acc, 3.0, 3, 8.0, False, 4.0)
    assert b.reward[0] == pytest.approx(2.0 + g * 4.0 + g * g * 8.0)


def test_terminal_flushes_partial_returns():
    g = 0.5
    acc = NStepAccumulator(3, g, 1)
    push1(acc, 0.0, 0, 1.0, False, 1.0)
    b = push1(acc, 1.0, 1, 2.0, True, 2.0)
    # Both pending emit with done=1: R0 = 1 + 0.5*2 = 2, R1 = 2.
    assert b.obs.shape[0] == 2
    assert b.reward[0] == pytest.approx(2.0)
    assert b.reward[1] == pytest.approx(2.0)
    assert np.all(b.done == 1.0)


def test_truncation_discards_pending():
    acc = NStepAccumulator(3, 0.9, 1)
    push1(acc, 0.0, 0, 1.0, False, 1.0)
    b = push1(acc, 1.0, 1, 2.0, False, 2.0, trunc=True)
    assert b is None
    assert len(acc.pending[0]) == 0


def test_n_step_1_equals_one_step():
    acc = NStepAccumulator(1, 0.9, 2)
    b = acc.push(
        np.zeros((2, 3), np.float32), np.asarray([1, 2]),
        np.asarray([5.0, 6.0]), np.asarray([False, True]),
        np.ones((2, 3), np.float32), truncated=np.asarray([False, False]),
    )
    assert b.obs.shape == (2, 3)
    np.testing.assert_allclose(b.reward, [5.0, 6.0])
    np.testing.assert_allclose(b.done, [0.0, 1.0])


def test_trainer_with_nstep(tmp_path):
    from multimodal_drl_rmc_tpu.config import Config, EnvConfig, HyperParams, ScenarioConfig
    from multimodal_drl_rmc_tpu.runtime.train import Trainer

    cfg = Config(
        env=EnvConfig(scenario=ScenarioConfig(episode_seconds=200.0)),
        hp=HyperParams(algo="DuelingDoubleDQNAgent", batch_size=8, min_mem=12,
                       max_mem=64, max_total_steps=4, save_freq=0, log_freq=0,
                       load=False, n_step=3,
                       save_dir=str(tmp_path) + "/", log_dir=str(tmp_path) + "/"),
    )
    trainer = Trainer(cfg, backend="fake", threaded=False)
    trainer.run()
    assert int(trainer.state.step) >= 4


# ---------------------------------------------------------------------------
# Device-path window reduction (sim/train_on_device.py n-step FIFO).
# ---------------------------------------------------------------------------

def test_window_reduce_matches_hand_computation():
    import jax.numpy as jnp

    from multimodal_drl_rmc_tpu.ops.nstep import nstep_window_reduce

    g = 0.9
    rew = jnp.asarray([[1.0], [2.0], [4.0]])
    done = jnp.zeros((3, 1))
    r, d = nstep_window_reduce(rew, done, g)
    assert float(r[0]) == pytest.approx(1.0 + g * 2.0 + g * g * 4.0)
    assert float(d[0]) == 0.0

    # Terminal at the middle step: reward after it (next episode) masked out.
    done = jnp.asarray([[0.0], [1.0], [0.0]])
    r, d = nstep_window_reduce(rew, done, g)
    assert float(r[0]) == pytest.approx(1.0 + g * 2.0)
    assert float(d[0]) == 1.0


def test_window_reduce_equivalent_to_host_accumulator():
    """Every start index must receive the same (return, done) from the
    device window formulation as from the host NStepAccumulator (emission
    times differ — the accumulator flushes early on terminals — but the
    per-transition targets must be identical)."""
    import jax.numpy as jnp

    from multimodal_drl_rmc_tpu.ops.nstep import nstep_window_reduce

    g, n = 0.8, 3
    rng = np.random.default_rng(0)
    T = 40
    rewards = rng.normal(size=T).astype(np.float32)
    dones = (rng.random(T) < 0.15)

    # Host accumulator: tag each start index via the obs value.
    acc = NStepAccumulator(n, g, 1)
    host = {}
    for t in range(T):
        b = push1(acc, float(t), t, float(rewards[t]), bool(dones[t]),
                  float(t + 1))
        if b is not None:
            for i in range(b.obs.shape[0]):
                host[int(b.obs[i, 0])] = (float(b.reward[i]), float(b.done[i]))

    # Device window: emit start index t at time t+n-1.
    for t in range(T - n + 1):
        w_r = jnp.asarray(rewards[t:t + n])[:, None]
        w_d = jnp.asarray(dones[t:t + n], jnp.float32)[:, None]
        r, d = nstep_window_reduce(w_r, w_d, g)
        if t in host:
            assert float(r[0]) == pytest.approx(host[t][0], abs=1e-5), t
            assert float(d[0]) == pytest.approx(host[t][1]), t


@pytest.mark.slow
def test_device_trainer_runs_with_nstep(monkeypatch):
    """Fused trainer smoke at n_step=3 on the CPU mesh: warm + train chunks
    execute, loss finite, and the learner's discount is gamma**3."""
    import jax

    from multimodal_drl_rmc_tpu.config import (
        Config, EnvConfig, HyperParams, ScenarioConfig,
    )
    from multimodal_drl_rmc_tpu.sim.train_on_device import DeviceTrainer

    cfg = Config(
        env=EnvConfig(scenario=ScenarioConfig(episode_seconds=120.0)),
        hp=HyperParams(batch_size=8, min_mem=16, max_mem=512,
                       max_total_steps=0, load=False, n_step=3),
    )
    tr = DeviceTrainer(cfg, batch=4, replay_ratio=1.0)
    carry = tr.init_carry()
    carry = tr._warm_chunk(carry, 4)
    carry, out = tr._train_chunk(carry)
    assert np.isfinite(float(out["loss"]))
    assert carry.nstep["obs"].shape == (2, 4, cfg.env.obs_size)


@pytest.mark.slow
def test_device_trainer_runs_noisy_qr():
    """Full-Rainbow agent (noisy + QR + PER + n-step) through the fused
    device trainer: the noise rng threads through select_actions and the
    quantile loss inside the scanned superstep."""
    from multimodal_drl_rmc_tpu.config import (
        Config, EnvConfig, HyperParams, ScenarioConfig,
    )
    from multimodal_drl_rmc_tpu.sim.train_on_device import DeviceTrainer

    cfg = Config(
        env=EnvConfig(scenario=ScenarioConfig(episode_seconds=120.0)),
        hp=HyperParams(algo="NoisyQrDuelingDQNAgent", batch_size=8,
                       min_mem=16, max_mem=512, max_total_steps=0,
                       load=False, n_step=3),
    )
    tr = DeviceTrainer(cfg, batch=4, replay_ratio=1.0)
    carry = tr.init_carry()
    carry = tr._warm_chunk(carry, 4)
    carry, out = tr._train_chunk(carry)
    assert np.isfinite(float(out["loss"]))
    p = carry.train_state.params["params"]
    assert "kernel_sigma" in p["fc_adv"]
    assert p["fc_adv"]["kernel"].shape[-1] == 8 * tr.learner.net.spec.n_atoms
