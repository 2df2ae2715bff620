"""Vmapped multi-seed trainer: K seeds in one XLA program == K solo runs.

Round 3 trained its 11-seed noisy-distributional sweep as serialized chip
queues; MultiSeedTrainer stacks the learner over a seed axis and flattens
the sim to one K*B batch. These tests pin the semantics: seed k of a
multi-seed run reproduces DeviceTrainer(cfg, seed=seeds[k]) — bit-exact
through the warm phase (same RNG tree, same env trajectories), and to
float tolerance through a learning superstep (vmapped matmuls may batch
reductions differently).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_drl_rmc_tpu.config import (
    Config,
    EnvConfig,
    HyperParams,
    ScenarioConfig,
)
from multimodal_drl_rmc_tpu.runtime import checkpoint
from multimodal_drl_rmc_tpu.sim.train_multiseed import (
    MultiSeedTrainer,
    seed_cfg,
)
from multimodal_drl_rmc_tpu.sim.train_on_device import DeviceTrainer


def _cfg(tmp_path, algo="PerDuelingDoubleDQNAgent", n_step=3, **hp_kw):
    hp = dict(algo=algo, n_step=n_step, batch_size=8, min_mem=16,
              max_mem=256, save_freq=0, log_freq=0, load=False,
              save_dir=str(tmp_path / "save") + "/",
              log_dir=str(tmp_path / "logs") + "/")
    hp.update(hp_kw)
    return Config(env=EnvConfig(scenario=ScenarioConfig(episode_seconds=120.0)),
                  hp=HyperParams(**hp))


def _slice_tree(tree, k):
    return jax.tree_util.tree_map(lambda x: np.asarray(x[k]), tree)


@pytest.mark.parametrize("algo", ["PerDuelingDoubleDQNAgent",
                                  "NoisyQrDuelingDQNAgent"])
def test_multiseed_warm_phase_bit_matches_solo(tmp_path, algo):
    """Through the (no-learning) warm phase, seed k's env trajectory in the
    stacked run is BIT-identical to a solo DeviceTrainer with that seed:
    the RNG derivation mirrors _fresh_carry leaf-for-leaf and the flat
    K*B sim batch steps each env independently."""
    B, seeds = 4, [5, 9]
    cfg = _cfg(tmp_path, algo=algo)
    multi = MultiSeedTrainer(cfg, seeds, batch=B, replay_ratio=1.0)
    cm = multi._fresh_carry()

    for k, s in enumerate(seeds):
        solo = DeviceTrainer(cfg, batch=B, seed=s, replay_ratio=1.0)
        cs = solo._fresh_carry()
        np.testing.assert_array_equal(np.asarray(cm.obs[k * B:(k + 1) * B]),
                                      np.asarray(cs.obs))
        np.testing.assert_array_equal(np.asarray(cm.rng[k]),
                                      np.asarray(cs.rng))

    # Warm 4 supersteps (random actions, no learning) on both.
    solo0 = DeviceTrainer(cfg, batch=B, seed=seeds[0], replay_ratio=1.0)
    cs = solo0._warm_chunk(solo0._fresh_carry(), 4, False)
    cm = multi._warm_chunk(cm, 4, False)
    np.testing.assert_array_equal(np.asarray(cm.obs[:B]), np.asarray(cs.obs))
    np.testing.assert_array_equal(np.asarray(cm.ep_ret[:B]),
                                  np.asarray(cs.ep_ret))
    np.testing.assert_array_equal(np.asarray(cm.nstep["rew"][:, :B]),
                                  np.asarray(cs.nstep["rew"]))
    # Replay contents match too (insert is a pure ring write per seed).
    def _leaves_equal(a, b):
        for la, lb in zip(jax.tree_util.tree_leaves(a),
                          jax.tree_util.tree_leaves(b)):
            np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
    _leaves_equal(_slice_tree(cm.buffer, 0), cs.buffer)
    # And the two seeds genuinely differ (independent demand streams).
    assert not np.array_equal(np.asarray(cm.obs[:B]), np.asarray(cm.obs[B:]))


def test_multiseed_noise_mode_bit_matches_solo(tmp_path):
    """Driver-noise mode (accel_noise_sigma > 0) composes with the vmapped
    multi-seed trainer with NO extra plumbing: the noise is drawn per env
    from each env's own RNG stream (sim/core.py step_1s_batched splits
    state.rng per row), so seed k's rows of the flat K*B batch see the
    same draws as a solo DeviceTrainer. Pins that noise-robust seed
    sweeps (scripts/run_noise_robust*.sh) can be batched K-at-a-time."""
    B, seeds = 4, [5, 9]
    cfg = _cfg(tmp_path)
    cfg = cfg.replace(env=EnvConfig(scenario=ScenarioConfig(
        episode_seconds=120.0, accel_noise_sigma=0.1)))
    multi = MultiSeedTrainer(cfg, seeds, batch=B, replay_ratio=1.0)
    cm = multi._warm_chunk(multi._fresh_carry(), 2, False)
    for k, s in enumerate(seeds):
        solo = DeviceTrainer(cfg, batch=B, seed=s, replay_ratio=1.0)
        cs = solo._warm_chunk(solo._fresh_carry(), 2, False)
        np.testing.assert_array_equal(
            np.asarray(cm.obs[k * B:(k + 1) * B]), np.asarray(cs.obs))
        np.testing.assert_array_equal(np.asarray(cm.ep_ret[k * B:(k + 1) * B]),
                                      np.asarray(cs.ep_ret))
    # And the noise genuinely perturbs the trajectory vs sigma=0.
    clean = MultiSeedTrainer(_cfg(tmp_path / "clean"), seeds, batch=B,
                             replay_ratio=1.0)
    cc = clean._warm_chunk(clean._fresh_carry(), 2, False)
    assert not np.array_equal(np.asarray(cm.obs), np.asarray(cc.obs))


@pytest.mark.slow
def test_multiseed_learning_step_matches_solo(tmp_path, monkeypatch):
    """One learning superstep (k_updates vmapped train_many) from identical
    warm state produces the solo run's params to float tolerance, per seed."""
    monkeypatch.setattr(DeviceTrainer, "CHUNK", 1)
    monkeypatch.setattr(MultiSeedTrainer, "CHUNK", 1)
    B, seeds = 4, [5, 9]
    cfg = _cfg(tmp_path)
    multi = MultiSeedTrainer(cfg, seeds, batch=B, replay_ratio=1.0)
    cm = multi._warm_chunk(multi._fresh_carry(), 4, False)
    cm, out_m = multi._train_chunk(cm)
    assert out_m["loss"].shape == (len(seeds),)

    for k, s in enumerate(seeds):
        solo = DeviceTrainer(cfg, batch=B, seed=s, replay_ratio=1.0)
        cs = solo._warm_chunk(solo._fresh_carry(), 4, False)
        cs, out_s = solo._train_chunk(cs)
        got = _slice_tree(cm.train_state.params, k)
        want = jax.tree_util.tree_map(np.asarray, cs.train_state.params)
        for lg, lw in zip(jax.tree_util.tree_leaves(got),
                          jax.tree_util.tree_leaves(want)):
            np.testing.assert_allclose(lg, lw, rtol=2e-4, atol=1e-6)
        np.testing.assert_allclose(float(out_m["loss"][k]),
                                   float(out_s["loss"]), rtol=2e-3)
        assert int(cm.train_state.step[k]) == int(cs.train_state.step)


@pytest.mark.slow
def test_multiseed_saves_per_seed_packs_and_resumes(tmp_path, monkeypatch):
    """save() writes one pack+state per seed under <save_dir>/s<seed>/;
    a second trainer with load=True resumes all seeds from those states
    and continues the per-seed step accounting."""
    import dataclasses

    monkeypatch.setattr(MultiSeedTrainer, "CHUNK", 1)
    B, seeds = 4, [3, 11]
    cfg = _cfg(tmp_path, max_total_steps=8)
    tr = MultiSeedTrainer(cfg, seeds, batch=B, replay_ratio=1.0)
    carry = tr._warm_chunk(tr._fresh_carry(), 4, False)
    carry, _ = tr._train_chunk(carry)
    tr.env_steps_done = 20
    tr.save(carry)
    for s in seeds:
        c = seed_cfg(cfg, s)
        assert os.path.isfile(checkpoint.pack_path(c)), c.hp.save_dir
        assert os.path.isfile(checkpoint.state_path(c))
        assert f"s{s}/" in c.hp.save_dir

    cfg2 = cfg.replace(hp=dataclasses.replace(cfg.hp, load=True))
    tr2 = MultiSeedTrainer(cfg2, seeds, batch=B, replay_ratio=1.0)
    c2 = tr2.init_carry()
    assert tr2.resumed and tr2.start_env_steps == 20
    for k in range(len(seeds)):
        assert int(c2.train_state.step[k]) == int(carry.train_state.step[k])

    # Partial checkpoint sets must hard-fail, not silently mix accounting.
    os.remove(checkpoint.state_path(seed_cfg(cfg, seeds[0])))
    tr3 = MultiSeedTrainer(cfg2, seeds, batch=B, replay_ratio=1.0)
    with pytest.raises(FileNotFoundError):
        tr3.init_carry()


@pytest.mark.slow
def test_multiseed_seed_axis_sharding_matches_unsharded(tmp_path, monkeypatch):
    """mesh= shards the seed axis over devices with zero collectives (the
    superstep has no cross-seed op): the sharded run's warm-phase carry is
    BIT-identical to the unsharded vmapped run, a train chunk produces the
    same losses to float tolerance, and the carry is genuinely distributed
    (every mesh device owns a shard)."""
    from jax.sharding import Mesh

    monkeypatch.setattr(MultiSeedTrainer, "CHUNK", 1)
    ndev = min(4, len(jax.devices()))
    if ndev < 2:
        pytest.skip("needs >=2 devices (tests/conftest.py forces 8 CPU)")
    B, seeds = 2, list(range(ndev))
    cfg = _cfg(tmp_path)
    mesh = Mesh(np.asarray(jax.devices()[:ndev]), ("seed",))
    plain = MultiSeedTrainer(cfg, seeds, batch=B, replay_ratio=1.0)
    shard = MultiSeedTrainer(cfg, seeds, batch=B, replay_ratio=1.0,
                             mesh=mesh)
    cp = plain._warm_chunk(plain._fresh_carry(), 4, False)
    cs = shard._warm_chunk(shard._fresh_carry(), 4, False)
    assert len(cs.train_state.step.sharding.device_set) == ndev
    for lp, ls in zip(jax.tree_util.tree_leaves(cp._replace(nstep=None)),
                      jax.tree_util.tree_leaves(cs._replace(nstep=None))):
        np.testing.assert_array_equal(np.asarray(lp), np.asarray(ls))
    cp, op = plain._train_chunk(cp)
    cs, os_ = shard._train_chunk(cs)
    np.testing.assert_allclose(np.asarray(op["loss"]),
                               np.asarray(os_["loss"]), rtol=2e-4)
    # Mesh size must divide K.
    with pytest.raises(ValueError, match="must divide"):
        MultiSeedTrainer(cfg, [1, 2, 3], batch=B, mesh=mesh)


@pytest.mark.slow
def test_multiseed_bf16_replay_trains(tmp_path, monkeypatch):
    """-obs_dtype bfloat16 (the HBM fit for K=4 at 1M capacity on a 16 GB
    v5e — see train_multiseed module docstring): replay obs leaves are
    stored bf16, a learning superstep still produces finite loss, and the
    learned params stay within bf16-quantization distance of the f32 run
    from identical warm state."""
    monkeypatch.setattr(MultiSeedTrainer, "CHUNK", 1)
    B, seeds = 4, [5, 9]
    runs = {}
    for dt in ("float32", "bfloat16"):
        cfg = _cfg(tmp_path / dt, obs_dtype=dt)
        tr = MultiSeedTrainer(cfg, seeds, batch=B, replay_ratio=1.0)
        carry = tr._warm_chunk(tr._fresh_carry(), 4, False)
        if dt == "bfloat16":
            assert carry.buffer.data.obs.dtype == jnp.bfloat16
            assert carry.buffer.data.next_obs.dtype == jnp.bfloat16
            assert carry.buffer.data.reward.dtype == jnp.float32
        carry, out = tr._train_chunk(carry)
        assert np.all(np.isfinite(np.asarray(out["loss"])))
        runs[dt] = jax.tree_util.tree_map(np.asarray,
                                          carry.train_state.params)
    for lf, lb in zip(jax.tree_util.tree_leaves(runs["float32"]),
                      jax.tree_util.tree_leaves(runs["bfloat16"])):
        # One update step from a bf16-quantized batch: params move by
        # O(lr * d(obs)) — close but not bit-equal to the f32 run.
        np.testing.assert_allclose(lf, lb, rtol=0.05, atol=5e-3)


def test_seed_cfg_placeholder():
    cfg = Config(hp=HyperParams(save_dir="save/probe/{seed}/x/",
                                log_dir="logs/probe/"))
    c = seed_cfg(cfg, 7)
    assert c.hp.save_dir == "save/probe/7/x/"
    assert c.hp.log_dir == "logs/probe/s7/"


def test_multiseed_rejects_duplicate_seeds(tmp_path):
    with pytest.raises(ValueError):
        MultiSeedTrainer(_cfg(tmp_path), [4, 4], batch=4)
