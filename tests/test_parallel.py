"""Multi-chip data-parallel learner on an 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_drl_rmc_tpu.config import Config, EnvConfig, HyperParams, NetworkSpec
from multimodal_drl_rmc_tpu.agents.dqn import ALGO_FLAGS, make_learner
from multimodal_drl_rmc_tpu.parallel.mesh import make_mesh
from multimodal_drl_rmc_tpu.parallel.dp import make_dp_learner
from multimodal_drl_rmc_tpu.ops.losses import Batch


def dp_config(algo: str) -> Config:
    env = EnvConfig(obs_variant="macro_no_lane")
    hp = HyperParams(algo=algo, batch_size=64, max_mem=1024, lr=1e-3, eps_dec=100.0)
    net = NetworkSpec(kind="mlp", macro_len=8, mlp_hidden=(32, 32),
                      dueling=ALGO_FLAGS[algo][1])
    return Config(env=env, hp=hp, net=net)


def mk_batch(rng, n=64):
    obs = jax.random.uniform(rng, (n, 8))
    action = jax.random.randint(jax.random.fold_in(rng, 1), (n,), 0, 8)
    reward = (action == (obs[:, 0] > 0.5).astype(jnp.int32)).astype(jnp.float32)
    return Batch(obs=obs, action=action, reward=reward,
                 done=jnp.ones(n, jnp.float32), next_obs=obs)


@pytest.mark.parametrize("algo", ["DuelingDoubleDQNAgent", "PerDuelingDoubleDQNAgent"])
def test_dp_train_step_runs_on_mesh(algo):
    assert len(jax.devices()) >= 8
    mesh = make_mesh(8)
    learner = make_dp_learner(dp_config(algo), mesh)
    state = learner.init_state(jax.random.PRNGKey(0))
    buffer = learner.init_buffer()
    for i in range(4):
        buffer = learner.insert(buffer, mk_batch(jax.random.PRNGKey(i), 64))
    for i in range(10):
        state, buffer, m = learner.train_step(state, buffer, jax.random.PRNGKey(100 + i))
    assert np.isfinite(float(m.loss))
    assert int(state.step) == 10
    a = learner.select_actions(state, jnp.zeros((4, 8)), jax.random.PRNGKey(5))
    assert a.shape == (4,)


def test_dp_matches_single_device_gradients():
    """One DP step on 8 shards with the same effective batch must move params
    the same direction as a single-device step (up to sampling)."""
    mesh = make_mesh(8)
    cfg = dp_config("DoubleDQNAgent")
    dp = make_dp_learner(cfg, mesh)
    state = dp.init_state(jax.random.PRNGKey(0))
    buffer = dp.init_buffer()
    batch = mk_batch(jax.random.PRNGKey(7), 512)
    buffer = dp.insert(buffer, batch)
    s1, buffer, m = dp.train_step(state, buffer, jax.random.PRNGKey(1))
    assert np.isfinite(float(m.loss))

    single = make_learner(cfg)
    st = single.init_state(jax.random.PRNGKey(0))
    bf = single.init_buffer()
    bf = single.insert(bf, batch)
    st1, bf, m1 = single.train_step(st, bf, jax.random.PRNGKey(1))
    # Same init, same-sized steps: losses are on the same scale.
    assert abs(float(m.loss) - float(m1.loss)) < 0.2


@pytest.mark.slow
def test_distributed_device_trainer_8dev():
    """Fused sharded-env + DP-learner training over the virtual mesh."""
    import jax
    import jax.numpy as jnp

    from multimodal_drl_rmc_tpu.config import (
        Config, EnvConfig, HyperParams, ScenarioConfig)
    from multimodal_drl_rmc_tpu.parallel.mesh import make_mesh
    from multimodal_drl_rmc_tpu.sim.distributed import DistributedDeviceTrainer

    cfg = Config(
        env=EnvConfig(scenario=ScenarioConfig(episode_seconds=120.0)),
        hp=HyperParams(algo="DuelingDoubleDQNAgent", batch_size=16,
                       min_mem=16, max_mem=512),
    )
    trainer = DistributedDeviceTrainer(cfg, make_mesh(8), envs_per_device=1)
    carry, out = trainer.run(warm_chunks=1, train_chunks=1)
    assert jnp.isfinite(out["loss"])
    assert int(carry.train_state.step) == trainer.CHUNK
    # Replicated train state stays identical across devices.
    leaf = jax.tree_util.tree_leaves(carry.train_state.params)[0]
    assert len(set(str(s.device) if hasattr(s, "device") else 0
                   for s in leaf.addressable_shards)) == 8


@pytest.mark.slow
def test_distributed_trainer_batched_kernel_matches_vmapped():
    """The per-shard BT>1 kernel path (interpret mode on the CPU mesh)
    produces the same training trajectory as the vmapped step inside
    shard_map — same RNG stream, so identical losses."""
    import jax
    import jax.numpy as jnp

    from multimodal_drl_rmc_tpu.config import (
        Config, EnvConfig, HyperParams, ScenarioConfig)
    from multimodal_drl_rmc_tpu.parallel.mesh import make_mesh
    from multimodal_drl_rmc_tpu.sim.distributed import DistributedDeviceTrainer

    cfg = Config(
        env=EnvConfig(scenario=ScenarioConfig(episode_seconds=120.0)),
        hp=HyperParams(algo="DuelingDoubleDQNAgent", batch_size=8,
                       min_mem=8, max_mem=256),
    )
    outs = {}
    for bk in (False, True):
        tr = DistributedDeviceTrainer(cfg, make_mesh(4), envs_per_device=1,
                                      seed=5, batched_kernel=bk)
        carry, out = tr.run(warm_chunks=1, train_chunks=1)
        outs[bk] = (float(out["loss"]), float(out["reward"]))
    assert outs[False][0] == pytest.approx(outs[True][0], rel=1e-4)
    assert outs[False][1] == pytest.approx(outs[True][1], rel=1e-4)


@pytest.mark.slow
def test_distributed_trainer_sharded_checkpoint_bit_identical(tmp_path):
    """Sharding-aware lossless resume on the virtual mesh: save the full
    sharded carry, restore it into a FRESH trainer (device_put back onto
    the mesh's NamedShardings), train one more chunk on each branch, and
    the replicated params, sharded replay and env states match exactly."""
    import dataclasses

    import jax
    import numpy as np

    from multimodal_drl_rmc_tpu.config import (
        Config, EnvConfig, HyperParams, ScenarioConfig)
    from multimodal_drl_rmc_tpu.parallel.mesh import make_mesh
    from multimodal_drl_rmc_tpu.sim.distributed import DistributedDeviceTrainer

    cfg = Config(
        env=EnvConfig(scenario=ScenarioConfig(episode_seconds=120.0)),
        hp=HyperParams(algo="PerDuelingDoubleDQNAgent", batch_size=8,
                       min_mem=8, max_mem=256,
                       save_dir=str(tmp_path) + "/"),
    )
    tr_a = DistributedDeviceTrainer(cfg, make_mesh(4), envs_per_device=1,
                                    seed=11)
    carry, _ = tr_a.run(warm_chunks=1, train_chunks=1)
    tr_a.save_full(carry, env_steps=2 * tr_a.CHUNK * tr_a.batch)
    cont_a, _ = tr_a._train_chunk(carry)  # uninterrupted branch

    tr_b = DistributedDeviceTrainer(cfg, make_mesh(4), envs_per_device=1,
                                    seed=77)
    carry_b, meta = tr_b.load_full_carry()
    assert meta["env_steps"] == 2 * tr_a.CHUNK * tr_a.batch
    cont_b, _ = tr_b._train_chunk(carry_b)

    la = jax.tree_util.tree_leaves(
        (cont_a.train_state, cont_a.buffer, cont_a.env_states, cont_a.rng))
    lb = jax.tree_util.tree_leaves(
        (cont_b.train_state, cont_b.buffer, cont_b.env_states, cont_b.rng))
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
