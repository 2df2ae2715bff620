"""Multi-chip fused training: sharded on-device envs + DP learner shards.

Composition of the two scale axes (SURVEY.md §5 'distributed backend'):

  * environments shard over the ``dp`` mesh axis — each device owns
    B/ndev independent on-device simulations (sim/env.py) and the replay
    shard they feed (distributed PER, parallel/dp.py);
  * learner parameters replicate; the per-step gradient pmean is the ONLY
    cross-chip traffic, lowered by XLA to an ICI all-reduce.

One shard_mapped superstep = epsilon-greedy act -> 40 s of traffic on
every local env -> local replay insert -> local sample + grad -> pmean ->
identical replicated update on every chip. Scanned in chunks like the
single-chip DeviceTrainer.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..agents.dqn import Metrics, TrainState
from ..config import Config
from ..models.networks import init_params
from ..ops.losses import Batch
from ..parallel.dp import init_sharded_buffer, make_local_fns
from .env import EnvState, make_env_fns


class ShardedCarry(NamedTuple):
    env_states: EnvState      # leaves sharded on leading (env-batch) dim
    obs: jax.Array            # [B, D] sharded
    train_state: TrainState   # replicated
    buffer: object            # capacity-sharded
    rng: jax.Array            # replicated (folded per device inside)


class DistributedDeviceTrainer:
    """Fused sim+learn over an ndev-device mesh."""

    CHUNK = 8

    def __init__(self, cfg: Config, mesh: Mesh, envs_per_device: int,
                 axis: str = "dp", seed: int = 0, replay_ratio: float = 0.0,
                 batched_kernel: bool | None = None):
        """``replay_ratio`` = learner updates per env transition, as in the
        single-chip DeviceTrainer: each local_train is ONE global update
        (the batch splits across shards), so k = replay_ratio * B updates
        run per superstep and schedules see n_env = B / k. 0 keeps the
        legacy one-update-per-superstep behavior (used by tiny dryruns).

        ``batched_kernel`` batches each shard's local envs into BT>1
        kernel blocks (sim/env.make_batched_step) instead of vmapping the
        single-env step — the same +31% sim-throughput path as the
        single-chip DeviceTrainer, per shard. Defaults to the Pallas
        availability check (on on real TPU, off on the CPU mesh)."""
        self.cfg = cfg
        self.mesh = mesh
        self.axis = axis
        ndev = mesh.shape[axis]
        self.ndev = ndev
        self.batch = envs_per_device * ndev
        self.local_b = envs_per_device
        if replay_ratio > 0:
            self.k_updates = max(1, int(round(replay_ratio * self.batch)))
            import dataclasses

            cfg = cfg.replace(hp=dataclasses.replace(
                cfg.hp, n_env=max(1, round(self.batch / self.k_updates))))
        else:
            self.k_updates = 1
        k_updates = self.k_updates
        fns = make_local_fns(cfg, ndev, axis)
        self.fns = fns
        reset_one, obs_one, step_one, _ = make_env_fns(cfg.env)
        if batched_kernel is None:
            from .core import use_pallas_substeps

            batched_kernel = use_pallas_substeps()
        if batched_kernel:
            from .env import make_batched_step

            step_local, _ = make_batched_step(cfg.env)
        else:
            step_local = jax.vmap(step_one)
        self.rng = jax.random.PRNGKey(seed)

        env_specs = jax.tree_util.tree_map(
            lambda _: P(axis),
            jax.eval_shape(reset_one, jax.random.PRNGKey(0)))
        state_specs = TrainState(P(), P(), P(), P(), P())
        carry_specs = ShardedCarry(
            env_states=env_specs, obs=P(axis), train_state=state_specs,
            buffer=fns.buf_specs, rng=P(),
        )

        def local_superstep(carry: ShardedCarry, random_actions: bool):
            my = jax.lax.axis_index(axis)
            rng = jax.random.fold_in(carry.rng, my)
            rng_act, rng_train, rng_next = jax.random.split(rng, 3)
            if random_actions:
                actions = jax.random.randint(
                    rng_act, (envs_per_device,), 0, fns.n_actions)
            else:
                actions = fns.select_actions(carry.train_state, carry.obs, rng_act)
            env_states, (obs_final, obs_next, rew, done, _m) = step_local(
                carry.env_states, actions)
            buffer = fns.local_insert(
                carry.buffer,
                Batch(obs=carry.obs, action=actions, reward=rew,
                      done=done.astype(jnp.float32), next_obs=obs_final),
            )
            if random_actions:
                train_state = carry.train_state
                metrics = Metrics(jnp.zeros(()), jnp.zeros(()), jnp.ones(()))
            elif k_updates > 1:
                def upd(tb, key):
                    ts, bf = tb
                    ts, bf, m = fns.local_train(ts, bf, key)
                    return (ts, bf), m

                (train_state, buffer), ms = jax.lax.scan(
                    upd, (carry.train_state, buffer),
                    jax.random.split(rng_train, k_updates))
                metrics = jax.tree_util.tree_map(lambda x: x[-1], ms)
            else:
                train_state, buffer, metrics = fns.local_train(
                    carry.train_state, buffer, rng_train)
            new_carry = ShardedCarry(
                env_states=env_states, obs=obs_next, train_state=train_state,
                buffer=buffer, rng=jax.random.fold_in(carry.rng, 7),
            )
            out = {"reward": jax.lax.pmean(rew.mean(), axis),
                   "loss": metrics.loss, "epsilon": metrics.epsilon}
            return new_carry, out

        def chunk_body(carry, random_actions: bool, n: int):
            def body(c, _):
                return local_superstep(c, random_actions)

            carry, outs = jax.lax.scan(body, carry, None, length=n)
            return carry, jax.tree_util.tree_map(lambda x: x[-1], outs)

        out_scalar = {"reward": P(), "loss": P(), "epsilon": P()}

        self._train_chunk = jax.jit(
            jax.shard_map(
                functools.partial(chunk_body, random_actions=False, n=self.CHUNK),
                mesh=mesh,
                in_specs=(carry_specs,),
                out_specs=(carry_specs, out_scalar),
                check_vma=False,
            ),
            donate_argnums=(0,),
        )
        self._warm_chunk = jax.jit(
            jax.shard_map(
                functools.partial(chunk_body, random_actions=True, n=self.CHUNK),
                mesh=mesh,
                in_specs=(carry_specs,),
                out_specs=(carry_specs, out_scalar),
                check_vma=False,
            ),
            donate_argnums=(0,),
        )

        # Sharded initializers.
        self._reset_envs = jax.jit(
            jax.vmap(reset_one),
            out_shardings=jax.tree_util.tree_map(
                lambda s: NamedSharding(mesh, s), env_specs),
        )
        self._obs_envs = jax.jit(
            jax.vmap(obs_one), out_shardings=NamedSharding(mesh, P(axis)))
        # Carry shardings, for re-laying-out a restored checkpoint.
        self._carry_shardings = jax.tree_util.tree_map(
            lambda s: NamedSharding(mesh, s), carry_specs)

    def init_carry(self) -> ShardedCarry:
        self.rng, r_env, r_state = jax.random.split(self.rng, 3)
        env_states = self._reset_envs(jax.random.split(r_env, self.batch))
        obs = self._obs_envs(env_states)
        params = init_params(self.fns.net, self.fns.obs_size, r_state)
        train_state = TrainState(
            params=params,
            target_params=jax.tree_util.tree_map(jnp.copy, params),
            opt_state=self.fns.tx.init(params),
            step=jnp.zeros((), jnp.int32),
            episode_count=jnp.zeros((), jnp.int32),
        )
        train_state = jax.device_put(train_state, NamedSharding(self.mesh, P()))
        buffer = init_sharded_buffer(self.fns, self.mesh, self.axis)
        return ShardedCarry(
            env_states=env_states, obs=obs, train_state=train_state,
            buffer=buffer, rng=jax.random.fold_in(self.rng, 3),
        )

    def run(self, warm_chunks: int = 1, train_chunks: int = 4):
        carry = self.init_carry()
        out = None
        for _ in range(warm_chunks):
            carry, out = self._warm_chunk(carry)
        for _ in range(train_chunks):
            carry, out = self._train_chunk(carry)
        return carry, out

    # -- lossless, sharding-aware checkpointing --------------------------
    def save_full(self, carry: ShardedCarry, env_steps: int = 0) -> str:
        """Persist the entire sharded carry (env states, replay shards incl.
        PER trees, replicated TrainState, RNG). Arrays gather to host numpy
        (single-process mesh: every shard is addressable)."""
        from ..runtime import checkpoint

        path = checkpoint.full_path(self.cfg)
        checkpoint.save_full(path, carry, {
            "env_steps": int(env_steps),
            "step": int(carry.train_state.step),
            # Shard count of the gathered P(axis) arrays — load_full needs
            # it to migrate per-shard heap PER trees correctly.
            "ndev": int(self.ndev),
        })
        return path

    def load_full_carry(self):
        """Restore a full checkpoint and re-lay it out over THIS trainer's
        mesh (device_put with the carry's NamedShardings — the saved run's
        mesh need not be this one as long as the env batch divides the dp
        axis the same way). Returns (carry, meta)."""
        from ..runtime import checkpoint

        template = self.init_carry()
        carry, meta = checkpoint.load_full(
            checkpoint.full_path(self.cfg), template, ndev=self.ndev)
        carry = jax.device_put(carry, self._carry_shardings)
        return carry, meta
