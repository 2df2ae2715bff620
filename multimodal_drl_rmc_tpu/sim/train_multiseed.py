"""Batched multi-seed training: K independent seeds in ONE XLA program.

Round 3 ran its entire empirical program as serialized chip queues — five
multi-day queues of 2.1M-step runs, each training a ~3.5 MB network at
single-digit MFU on a v5e (the reference has no analogue: it cannot even
run one seed faster than realtime, train.py:83-108). The fused
DeviceTrainer was built from pure functional state precisely so seeds
could stack: this module vmaps the learner over a leading seed axis while
the device sim steps all K*B environments as ONE flat batch (more 8-env
kernel blocks per `fused_step_full` grid, amortizing dispatch — the sim
does not care which seed an env belongs to, the learner does).

Semantics: seed k behaves exactly like `DeviceTrainer(cfg, seed=seeds[k])`
— same RNG derivation (PRNGKey(seed) split/fold structure mirrored
leaf-for-leaf), same per-seed epsilon/tau/PER-beta schedules, same n-step
window, same snapshot cadence. Equivalence is tested in
tests/test_multiseed.py (warm-phase trajectories bit-match a solo run;
one learner update matches to float tolerance).

Memory: each seed carries its own replay buffer (hp.max_mem transitions).
The hybrid obs is 284 floats, and the TPU tiles an [N, 284] f32 array to
[N, 384] (T(8,128) lane padding, 1.35x) — at the default 1M capacity the
f32 obs/next_obs pair is ~3.1 GB padded per seed, so K=4 is ~12.3 GB of
carry and the compiler OOMs a 16 GB v5e while staging padded copies
(measured: 20.1G requested, two 5.72G remat-uncompress temps of
f32[4,1M,284]). Production multi-seed runs therefore set
``-obs_dtype bfloat16``: replay obs storage halves to ~1.5 GB/seed
(inserts cast down, samples cast back to f32; rewards/actions/done stay
exact), and K=4 at full 1M capacity compiles with headroom.
"""

from __future__ import annotations

import dataclasses
import os
import shutil
import time
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from ..agents.dqn import make_learner
from ..config import Config
from ..ops.losses import Batch
from ..ops.nstep import nstep_window_reduce
from .. import guard
from ..runtime import checkpoint
from ..runtime.metrics import MetricsWriter
from .env import DeviceRampEnv


class MultiCarry(NamedTuple):
    env_states: object      # flat [K*B, ...] device-sim states
    obs: jax.Array          # [K*B, D]
    train_state: object     # stacked [K, ...] per-seed TrainState
    buffer: object          # stacked [K, ...] per-seed replay
    rng: jax.Array          # [K, 2] per-seed keys
    ep_ret: jax.Array       # [K*B]
    rew_mean: jax.Array     # [K] per-seed finished-episode EMA
    episodes: jax.Array     # [K]
    nstep: object = None    # flat leaves [n-1, K*B, ...]


def seed_cfg(cfg: Config, seed: int) -> Config:
    """Per-seed Config: save/log dirs get an `s{seed}` leaf (or replace a
    literal `{seed}` placeholder), so checkpoints/snapshots/packs of the
    K seeds never collide."""
    def _dir(d: str) -> str:
        if "{seed}" in d:
            return d.replace("{seed}", str(seed))
        return os.path.join(d.rstrip("/"), f"s{seed}") + "/"
    hp = dataclasses.replace(cfg.hp, save_dir=_dir(cfg.hp.save_dir),
                             log_dir=_dir(cfg.hp.log_dir))
    return cfg.replace(hp=hp)


class MultiSeedTrainer:
    """K seeds of the fused on-TPU trainer in one jitted superstep."""

    CHUNK = 16
    SAVE_MIN_ITERS = 512
    SNAPSHOT_EVERY = 1_000_000

    def __init__(self, cfg: Config, seeds: Sequence[int],
                 batch: int | None = None, replay_ratio: float = 1.0,
                 mesh=None, mesh_axis: str = "seed"):
        """``mesh``: optional jax.sharding.Mesh — shards the seed axis
        across devices. The seed dimension is embarrassingly parallel
        (every op in one_iter is per-seed or per-env), so auto-SPMD
        partitions the whole superstep with ZERO collectives: on a pod,
        K seeds cost one seed's wall-clock + one seed's HBM per chip.
        (On one chip the vmapped program scales linearly — measured
        1670 total env-steps/s at K=4 vs 1673 solo — because the fused
        trainer is already throughput-bound; the mesh axis is where the
        multi-seed win actually lives.) Requires mesh.shape[mesh_axis]
        to divide K."""
        if len(set(seeds)) != len(seeds):
            raise ValueError(f"duplicate seeds: {seeds}")
        self.cfg = cfg
        self.seeds = list(seeds)
        self.K = K = len(self.seeds)
        self.mesh, self.mesh_axis = mesh, mesh_axis
        if mesh is not None and K % mesh.shape[mesh_axis]:
            raise ValueError(
                f"mesh axis {mesh_axis!r} ({mesh.shape[mesh_axis]} devices) "
                f"must divide K={K}")
        self.batch = B = batch or max(cfg.hp.n_env, 1)
        # Identical per-seed schedule semantics to DeviceTrainer: k updates
        # per superstep per seed, effective n_env = B / k.
        self.k_updates = max(1, int(round(replay_ratio * B)))
        n_env_eff = max(1, round(B / self.k_updates))
        lcfg = cfg.replace(hp=dataclasses.replace(cfg.hp, n_env=n_env_eff))
        self.env = DeviceRampEnv(cfg.env, K * B)
        self.learner = make_learner(lcfg)
        self.seed_cfgs = [seed_cfg(cfg, s) for s in self.seeds]

        learner, env = self.learner, self.env
        k_updates = self.k_updates
        n_step = cfg.hp.n_step
        gamma = cfg.hp.gamma
        D = env.obs_size
        # Env-side safety envelope — same clamp as DeviceTrainer.one_iter
        # (obs feature 4 = prev cycle's normalized merge occ) so stacked
        # guard-trained seeds stay bit-identical to solo runs.
        guard_thr = (cfg.env.guard_occ / cfg.env.max_occupancy_percent
                     if cfg.env.guard_occ > 0.0 else 0.0)
        guard_cap = int(cfg.env.guard_cap)

        def one_iter(carry: MultiCarry, random_actions: bool,
                     learn: bool = True):
            keys = jax.vmap(lambda k: jax.random.split(k, 3))(carry.rng)
            rng, r_act, r_train = keys[:, 0], keys[:, 1], keys[:, 2]
            if random_actions:
                actions = jax.vmap(
                    lambda r: jax.random.randint(r, (B,), 0, env.n_actions)
                )(r_act)
            else:
                actions = jax.vmap(learner.select_actions)(
                    carry.train_state, carry.obs.reshape(K, B, D), r_act)
            actions = guard.clamp(actions, carry.obs[:, 4].reshape(K, B),
                                  guard_thr, guard_cap)
            env_states, (obs_final, obs_next, rew, done, _m) = env.step(
                carry.env_states, actions.reshape(K * B))
            done_f = done.astype(jnp.float32)
            actions_flat = actions.reshape(K * B)
            if n_step > 1:
                nb = carry.nstep
                obs_w = jnp.concatenate([nb["obs"], carry.obs[None]], axis=0)
                act_w = jnp.concatenate([nb["act"], actions_flat[None]], axis=0)
                rew_w = jnp.concatenate([nb["rew"], rew[None]], axis=0)
                done_w = jnp.concatenate([nb["done"], done_f[None]], axis=0)
                ret_n, done_n = nstep_window_reduce(rew_w, done_w, gamma)
                batch = Batch(obs=obs_w[0], action=act_w[0], reward=ret_n,
                              done=done_n, next_obs=obs_final)
                nstep_next = {"obs": obs_w[1:], "act": act_w[1:],
                              "rew": rew_w[1:], "done": done_w[1:]}
            else:
                batch = Batch(obs=carry.obs, action=actions_flat, reward=rew,
                              done=done_f, next_obs=obs_final)
                nstep_next = None
            # Re-seed-major for the per-seed replay insert.
            batch_k = jax.tree_util.tree_map(
                lambda x: x.reshape((K, B) + x.shape[1:]), batch)
            buffer = jax.vmap(learner.insert)(carry.buffer, batch_k)
            if random_actions or not learn:
                train_state, metrics = carry.train_state, None
            elif k_updates > 1:
                train_state, buffer, metrics = jax.vmap(
                    lambda s, b, r: learner.train_many(s, b, r, k_updates)
                )(carry.train_state, buffer, r_train)
            else:
                train_state, buffer, metrics = jax.vmap(learner.train_step)(
                    carry.train_state, buffer, r_train)

            ep_ret = carry.ep_ret + rew
            done_k = done.reshape(K, B)
            n_done = done_k.sum(axis=1)
            done_ret = jnp.where(done_k, ep_ret.reshape(K, B), 0.0).sum(axis=1)
            rew_mean = jnp.where(
                n_done > 0,
                0.9 * carry.rew_mean + 0.1 * done_ret / jnp.maximum(n_done, 1),
                carry.rew_mean,
            )
            new_carry = MultiCarry(
                env_states=env_states, obs=obs_next,
                train_state=train_state, buffer=buffer, rng=rng,
                ep_ret=jnp.where(done, 0.0, ep_ret),
                rew_mean=rew_mean,
                episodes=carry.episodes + n_done,
                nstep=nstep_next,
            )
            out = {
                "reward": rew.reshape(K, B).mean(axis=1),
                "loss": metrics.loss if metrics is not None
                else jnp.zeros((K,)),
                "epsilon": metrics.epsilon if metrics is not None
                else jnp.ones((K,)),
            }
            return new_carry, out

        import functools

        @functools.partial(jax.jit, static_argnums=(1, 2), donate_argnums=(0,))
        def warm_chunk(carry: MultiCarry, n: int = 8, greedy: bool = False):
            def body(c, _):
                return one_iter(c, random_actions=not greedy, learn=False)
            return jax.lax.scan(body, carry, None, length=n)[0]

        @functools.partial(jax.jit, donate_argnums=(0,))
        def train_chunk(carry: MultiCarry):
            def body(c, _):
                return one_iter(c, False)
            carry, outs = jax.lax.scan(body, carry, None, length=self.CHUNK)
            last = jax.tree_util.tree_map(lambda x: x[-1], outs)
            last["reward"] = outs["reward"].mean(axis=0)
            return carry, last

        self._warm_chunk = warm_chunk
        self._train_chunk = train_chunk

    # -- seed-axis sharding --------------------------------------------------

    def _lead_sharding(self, x):
        """NamedSharding putting dim 0 (the seed / seed-major-env axis) on
        the mesh's seed axis."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        ndim = getattr(x, "ndim", 0)
        if ndim >= 1:
            return NamedSharding(self.mesh,
                                 P(self.mesh_axis, *([None] * (ndim - 1))))
        return NamedSharding(self.mesh, P())

    def _carry_shardings(self, carry: MultiCarry) -> MultiCarry:
        """Sharding tree for a MultiCarry: every leaf is seed-major on
        dim 0 ([K, ...] learner state / [K*B, ...] env state) except the
        n-step window, whose seed-major axis is dim 1 ([n-1, K*B, ...]).
        The superstep has no cross-seed op, so jit auto-SPMD partitions it
        with zero collectives. Validated on the virtual CPU mesh (XLA env
        path); a real pod should set MDRLRMC_BATCHED=0 — the BT>1 Pallas
        kernel is not written for auto-partitioning (the shard_map
        per-shard kernel route lives in sim/distributed.py)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        t = jax.tree_util.tree_map

        def second(x):
            return NamedSharding(
                self.mesh, P(None, self.mesh_axis, *([None] * (x.ndim - 2))))

        return MultiCarry(
            env_states=t(self._lead_sharding, carry.env_states),
            obs=self._lead_sharding(carry.obs),
            train_state=t(self._lead_sharding, carry.train_state),
            buffer=t(self._lead_sharding, carry.buffer),
            rng=self._lead_sharding(carry.rng),
            ep_ret=self._lead_sharding(carry.ep_ret),
            rew_mean=self._lead_sharding(carry.rew_mean),
            episodes=self._lead_sharding(carry.episodes),
            nstep=None if carry.nstep is None else t(second, carry.nstep),
        )

    # -- state construction ------------------------------------------------

    def _fresh_carry(self) -> MultiCarry:
        """Stacked mirror of DeviceTrainer._fresh_carry: seed k's RNG tree
        (env-reset keys, init key, carry key) is derived from
        PRNGKey(seeds[k]) with the exact same split/fold structure, so a
        multi-seed run is trajectory-identical to K solo runs."""
        K, B, D = self.K, self.batch, self.env.obs_size
        env_keys, state_keys, carry_keys = [], [], []
        for s in self.seeds:
            root, r_env, r_state = jax.random.split(jax.random.PRNGKey(s), 3)
            env_keys.append(jax.random.split(r_env, B))
            state_keys.append(r_state)
            carry_keys.append(jax.random.fold_in(root, 7))
        env_states = self.env._reset(jnp.concatenate(env_keys, axis=0))
        obs = self.env._obs(env_states)
        train_state = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs),
            *[self.learner.init_state(k) for k in state_keys])
        # Build the stacked replay ON DEVICE in one program: stacking K
        # host-built buffers (K x ~2.3 GB at the default 1M-transition
        # capacity) transiently needs 2x the stacked size and
        # RESOURCE_EXHAUSTs the 16 GB v5e at K=4 — a single jitted
        # vmap-of-init materializes the [K, ...] zeros exactly once.
        init_stacked = lambda: jax.vmap(          # noqa: E731
            lambda _: self.learner.init_buffer())(jnp.arange(K))
        if self.mesh is not None:
            # Materialize the stacked replay DIRECTLY sharded — a pod-size
            # buffer must never exist whole on one device.
            shapes = jax.eval_shape(init_stacked)
            buffer = jax.jit(init_stacked, out_shardings=jax.tree_util.tree_map(
                self._lead_sharding, shapes))()
        else:
            buffer = jax.jit(init_stacked)()
        nstep = None
        if self.cfg.hp.n_step > 1:
            m = self.cfg.hp.n_step - 1
            nstep = {
                "obs": jnp.zeros((m, K * B, D), jnp.float32),
                "act": jnp.zeros((m, K * B), jnp.int32),
                "rew": jnp.zeros((m, K * B), jnp.float32),
                "done": jnp.ones((m, K * B), jnp.float32),
            }
        carry = MultiCarry(
            env_states=env_states, obs=obs, train_state=train_state,
            buffer=buffer, rng=jnp.stack(carry_keys),
            ep_ret=jnp.zeros((K * B,), jnp.float32),
            rew_mean=jnp.zeros((K,), jnp.float32),
            episodes=jnp.zeros((K,)),
            nstep=nstep,
        )
        if self.mesh is not None:
            carry = jax.device_put(carry, self._carry_shardings(carry))
        return carry

    def seed_state(self, carry: MultiCarry, k: int):
        """Unstacked TrainState of seed index k (host copy)."""
        return jax.tree_util.tree_map(lambda x: x[k], carry.train_state)

    def init_carry(self) -> MultiCarry:
        carry = self._fresh_carry()
        self.resumed = False
        self.start_env_steps = 0
        if not self.cfg.hp.load:
            return carry
        # Resume from per-seed TrainState checkpoints (the small 2-min-cadence
        # saves; replay refills on-policy like the solo resume path,
        # reference train.py:68-72). All-or-nothing: a partial set would mix
        # step accounting across the stacked axis.
        paths = [checkpoint.state_path(c) for c in self.seed_cfgs]
        have = [os.path.isfile(p) for p in paths]
        if not any(have):
            return carry
        if not all(have):
            missing = [p for p, h in zip(paths, have) if not h]
            raise FileNotFoundError(
                f"partial multi-seed resume: missing {missing}")
        states, metas = [], []
        for c, t in zip(self.seed_cfgs,
                        [self.seed_state(carry, k) for k in range(self.K)]):
            st, meta = checkpoint.try_resume(c, t)
            states.append(st)
            metas.append(meta)
        self.resumed = True
        # Seeds save at the same iteration; take min for safety.
        self.start_env_steps = min(
            int(m.get("env_steps", m.get("step", 0) * self.batch
                      // self.k_updates)) for m in metas)
        print(f"resumed multi-seed trainer at {self.start_env_steps} env "
              f"steps (seeds {self.seeds})")
        carry = carry._replace(
            train_state=jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs), *states),
            rew_mean=jnp.asarray([m.get("rew_mean", 0.0) for m in metas],
                                 jnp.float32),
            episodes=jnp.asarray([float(m.get("episode_count", 0))
                                  for m in metas]),
        )
        if self.mesh is not None:
            carry = jax.device_put(carry, self._carry_shardings(carry))
        return carry

    # -- persistence ---------------------------------------------------------

    def save(self, carry: MultiCarry) -> None:
        for k, c in enumerate(self.seed_cfgs):
            state = self.seed_state(carry, k)

            class _S:
                rew_mean = float(carry.rew_mean[k])
                len_mean = float(self.cfg.env.max_agent_steps_per_episode)
                count = int(carry.episodes[k])

            checkpoint.save_all(c, state, _S(), extra_meta={
                "env_steps": int(getattr(self, "env_steps_done", 0)
                                 or getattr(self, "start_env_steps", 0)),
                "multiseed": self.seeds,
            })

    def _snapshot(self, genv: int, window: int) -> None:
        se = int(os.environ.get("MDRLRMC_SNAPSHOT_EVERY", self.SNAPSHOT_EVERY))
        if genv // se > (genv - window) // se:
            tag = f"_step{genv // se * se // 1000}k"
            for c in self.seed_cfgs:
                pack = checkpoint.pack_path(c)
                shutil.copyfile(pack, pack.replace("_model.pack",
                                                   f"{tag}_model.pack"))

    # -- driver --------------------------------------------------------------

    def run(self, log: bool = True) -> MultiCarry:
        cfg = self.cfg
        carry = self.init_carry()
        self.env_steps_done = self.start_env_steps
        writers = []
        if log:
            for c in self.seed_cfgs:
                run = checkpoint.run_name(c)
                if c.env.obs_variant != "hybrid":
                    run += f"_{c.env.obs_variant}"
                writers.append(MetricsWriter(c.hp.log_dir, run + "_device"))

        t_init = time.time()
        warm_iters = max(1, cfg.hp.min_mem // self.batch)
        done_warm = 0
        while done_warm < warm_iters:
            n = min(8, warm_iters - done_warm)
            carry = self._warm_chunk(carry, n, self.resumed)
            done_warm += n
        jax.block_until_ready(carry.obs)
        print(f"[multiseed] K={self.K} seeds={self.seeds} B={self.batch}: "
              f"warm phase done ({warm_iters} iters, "
              f"{time.time() - t_init:.1f}s incl. compile)", flush=True)

        total_iters = max(0 if self.resumed else 1,
                          (cfg.hp.max_total_steps - self.start_env_steps)
                          // self.batch)
        save_iters = max(cfg.hp.save_freq // self.batch,
                         self.SAVE_MIN_ITERS) // self.CHUNK * self.CHUNK \
            or self.CHUNK
        t0 = time.time()
        it = 0
        start = self.start_env_steps
        while it < total_iters:
            carry, out = self._train_chunk(carry)
            it += self.CHUNK
            if it == self.CHUNK:
                jax.block_until_ready(out["loss"])
                print(f"[multiseed] first train chunk done "
                      f"({time.time() - t0:.1f}s incl. compile)", flush=True)
            self.env_steps_done = start + it * self.batch   # per-seed steps
            genv = self.env_steps_done
            if it % save_iters == 0 and it < total_iters:
                self.save(carry)
                self._snapshot(genv, save_iters * self.batch)
            if writers and (it % max(self.CHUNK,
                                     (cfg.hp.log_freq // self.batch)
                                     // self.CHUNK * self.CHUNK
                                     or self.CHUNK) == 0):
                jax.block_until_ready(out["loss"])
                sps = it * self.batch * self.K / max(time.time() - t0, 1e-9)
                for k, w in enumerate(writers):
                    w.scalars({
                        "AvgRew": float(carry.rew_mean[k]),
                        "Episodes": float(carry.episodes[k]),
                        "loss": float(out["loss"][k]),
                        "epsilon": float(out["epsilon"][k]),
                        "cycle_reward": float(out["reward"][k]),
                        "env_steps_per_sec": sps / self.K,
                    }, genv)
                ema = "/".join(f"{float(x):.2f}" for x in carry.rew_mean)
                print(f"iter {genv} (x{self.K} seeds): rew_ema {ema} "
                      f"{sps:.1f} total env-steps/s")
        for w in writers:
            w.close()
        return carry


def train_multiseed(cfg: Config, seeds: Sequence[int],
                    batch: int | None = None,
                    replay_ratio: float = 1.0) -> None:
    trainer = MultiSeedTrainer(cfg, seeds, batch=batch,
                               replay_ratio=replay_ratio)
    carry = trainer.run()
    trainer.save(carry)
    for c in trainer.seed_cfgs:
        print(f"saved {checkpoint.pack_path(c)}")
