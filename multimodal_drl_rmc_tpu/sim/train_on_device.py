"""Fully-fused on-TPU training: batched sim + learner in one XLA program.

The reference's wall-clock is bounded by ~40 TraCI round-trips per
transition (SURVEY.md §6 'hard parts'); its learner idles waiting on SUMO.
Here the actor IS device code (sim/env.py), so the whole
  epsilon-greedy act -> 40 s traffic cycle x B envs -> replay insert ->
  k learner updates
iteration is a single jitted superstep, scanned on device in chunks. The
host only sees periodic metric scalars. This is the path that turns the
TPU's FLOPs into transitions/sec — B envs step in lockstep under vmap and
the learner trains from HBM replay between cycles.
"""

from __future__ import annotations

import os
import time
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..agents.dqn import make_learner
from ..config import Config
from ..ops.losses import Batch
from .. import guard
from ..ops.nstep import nstep_window_reduce
from ..runtime import checkpoint
from ..runtime.metrics import MetricsWriter
from .env import DeviceRampEnv, EnvState


class Carry(NamedTuple):
    env_states: EnvState
    obs: jax.Array
    train_state: object
    buffer: object
    rng: jax.Array
    ep_ret: jax.Array      # [B] running episode returns
    rew_mean: jax.Array    # [] EMA of finished-episode returns
    episodes: jax.Array    # [] finished-episode count
    # n-step FIFO window (None when n_step == 1): the last n-1 transitions'
    # pre-step obs [n-1, B, D], actions [n-1, B], rewards [n-1, B], and
    # terminal flags [n-1, B], oldest first.
    nstep: object = None


class DeviceTrainer:
    def __init__(self, cfg: Config, batch: int | None = None, seed: int = 0,
                 replay_ratio: float = 1.0):
        """``replay_ratio`` = learner updates per env transition.

        The reference trains with one gradient update per env step
        (train.py:83-108); with B envs stepping in lockstep that is
        k = replay_ratio * B updates per superstep, run as one on-device
        lax.scan (learner.train_many). Schedules (epsilon, tau, hard-update
        freq) see the effective n_env = B / k, so replay_ratio=1 reproduces
        the reference's per-transition semantics exactly — tau=1e-3 per
        update, epsilon decayed per transition. (Round 1 trained at the
        implicit ratio 1/B = one update per 256 transitions, which
        under-trained the agent to the point a constant action beat it.)
        """
        self.cfg = cfg
        self.batch = batch or max(cfg.hp.n_env, 1)
        self.k_updates = max(1, int(round(replay_ratio * self.batch)))
        n_env_eff = max(1, round(self.batch / self.k_updates))
        import dataclasses

        lcfg = cfg.replace(hp=dataclasses.replace(cfg.hp, n_env=n_env_eff))
        self.env = DeviceRampEnv(cfg.env, self.batch)
        self.learner = make_learner(lcfg)
        self.rng = jax.random.PRNGKey(seed)

        learner, env, B = self.learner, self.env, self.batch
        k_updates = self.k_updates
        n_step = cfg.hp.n_step
        gamma = cfg.hp.gamma
        # Env-side safety envelope (EnvConfig.guard_occ; 0 = off): obs
        # feature 4 IS the previous cycle's merge occupancy normalized by
        # max_occupancy_percent (sim/env.py macro_state — shared base
        # layout across all obs variants), so the guard threshold needs no
        # extra carry state and full checkpoints stay format-compatible.
        guard_thr = (cfg.env.guard_occ / cfg.env.max_occupancy_percent
                     if cfg.env.guard_occ > 0.0 else 0.0)
        guard_cap = int(cfg.env.guard_cap)

        def one_iter(carry: Carry, random_actions: bool,
                     learn: bool = True) -> tuple[Carry, dict]:
            rng, r_act, r_train = jax.random.split(carry.rng, 3)
            if random_actions:
                actions = jax.random.randint(r_act, (B,), 0, env.n_actions)
            else:
                actions = learner.select_actions(carry.train_state, carry.obs, r_act)
            # Clamp what the env EXECUTES (and what replay stores):
            # guard-in-the-loop training learns Q-values of the guarded
            # MDP, not the raw one (VERDICT r4 #3). guard.clamp is a no-op
            # (Python branch) when guard_thr <= 0.
            actions = guard.clamp(actions, carry.obs[:, 4], guard_thr,
                                  guard_cap)
            env_states, (obs_final, obs_next, rew, done, _m) = env.step(
                carry.env_states, actions)
            done_f = done.astype(jnp.float32)
            if n_step > 1:
                # Window = FIFO of the last n-1 transitions + the current
                # one; emit the n-step transition that STARTS at the oldest
                # entry (ops/nstep.nstep_window_reduce masks rewards past a
                # terminal; done inside the window => done_n=1, so next_obs
                # is never bootstrapped from and obs_final is correct).
                nb = carry.nstep
                obs_w = jnp.concatenate([nb["obs"], carry.obs[None]], axis=0)
                act_w = jnp.concatenate([nb["act"], actions[None]], axis=0)
                rew_w = jnp.concatenate([nb["rew"], rew[None]], axis=0)
                done_w = jnp.concatenate([nb["done"], done_f[None]], axis=0)
                ret_n, done_n = nstep_window_reduce(rew_w, done_w, gamma)
                batch = Batch(obs=obs_w[0], action=act_w[0], reward=ret_n,
                              done=done_n, next_obs=obs_final)
                nstep_next = {"obs": obs_w[1:], "act": act_w[1:],
                              "rew": rew_w[1:], "done": done_w[1:]}
            else:
                batch = Batch(obs=carry.obs, action=actions, reward=rew,
                              done=done_f, next_obs=obs_final)
                nstep_next = None
            buffer = learner.insert(carry.buffer, batch)
            if random_actions or not learn:
                train_state, metrics = carry.train_state, None
            elif k_updates > 1:
                train_state, buffer, metrics = learner.train_many(
                    carry.train_state, buffer, r_train, k_updates)
            else:
                train_state, buffer, metrics = learner.train_step(
                    carry.train_state, buffer, r_train)

            ep_ret = carry.ep_ret + rew
            n_done = done.sum()
            done_ret = jnp.where(done, ep_ret, 0.0).sum()
            rew_mean = jnp.where(
                n_done > 0,
                0.9 * carry.rew_mean + 0.1 * done_ret / jnp.maximum(n_done, 1),
                carry.rew_mean,
            )
            new_carry = Carry(
                env_states=env_states, obs=obs_next,
                train_state=train_state, buffer=buffer, rng=rng,
                ep_ret=jnp.where(done, 0.0, ep_ret),
                rew_mean=rew_mean,
                episodes=carry.episodes + n_done,
                nstep=nstep_next,
            )
            out = {
                "reward": rew.mean(),
                "loss": metrics.loss if metrics is not None else jnp.zeros(()),
                "epsilon": metrics.epsilon if metrics is not None else jnp.ones(()),
            }
            return new_carry, out

        import functools

        @functools.partial(jax.jit, static_argnums=(1, 2))
        def warm_chunk(carry: Carry, n: int = 8, greedy: bool = False):
            """Buffer refill. Fresh runs use random actions; resumed runs
            refill on-policy (reference train.py:68-72) — epsilon is
            already at its resumed schedule value, so select_actions is
            the reference's greedy-with-eps_min refill."""
            def body(c, _):
                return one_iter(c, random_actions=not greedy, learn=False)
            return jax.lax.scan(body, carry, None, length=n)[0]

        @jax.jit
        def train_chunk(carry: Carry):
            def body(c, _):
                return one_iter(c, False)
            carry, outs = jax.lax.scan(body, carry, None, length=self.CHUNK)
            last = jax.tree_util.tree_map(lambda x: x[-1], outs)
            last["reward"] = outs["reward"].mean()
            return carry, last

        self._warm_chunk = warm_chunk
        self._train_chunk = train_chunk

    CHUNK = 16
    SAVE_MIN_ITERS = 512        # periodic-save cadence floor (iterations)
    # Env steps between step-tagged pack copies. Distributional heads peak
    # early and degrade (BENCHMARKS.md) — a denser grid via
    # MDRLRMC_SNAPSHOT_EVERY gives the eval-based snapshot selection more
    # candidates without touching the default long-run cadence. The env
    # var is read at USE time (like MDRLRMC_FULL_SAVE_EVERY/_PER_TREE),
    # so in-process setters and monkeypatch.setenv behave as expected.
    SNAPSHOT_EVERY = 1_000_000

    def _fresh_carry(self) -> Carry:
        self.rng, r_env, r_state = jax.random.split(self.rng, 3)
        env_states, obs = self.env.reset(r_env)
        train_state = self.learner.init_state(r_state)
        nstep = None
        if self.cfg.hp.n_step > 1:
            m = self.cfg.hp.n_step - 1
            B, D = self.batch, self.env.obs_size
            # done=1 in the initial window: the first m emitted transitions
            # are zero-state terminals with ~0 return — noise-level among
            # the 100k random warm-up transitions.
            nstep = {
                "obs": jnp.zeros((m, B, D), jnp.float32),
                "act": jnp.zeros((m, B), jnp.int32),
                "rew": jnp.zeros((m, B), jnp.float32),
                "done": jnp.ones((m, B), jnp.float32),
            }
        return Carry(
            env_states=env_states, obs=obs,
            train_state=train_state,
            buffer=self.learner.init_buffer(),
            rng=jax.random.fold_in(self.rng, 7),
            ep_ret=jnp.zeros((self.batch,), jnp.float32),
            rew_mean=jnp.zeros((), jnp.float32),
            episodes=jnp.zeros(()),
            nstep=nstep,
        )

    def init_carry(self) -> Carry:
        carry = self._fresh_carry()
        self.resumed = False
        self.full_resumed = False
        self.start_env_steps = 0
        if not self.cfg.hp.load:
            return carry

        # Resume source: the LOSSLESS full-Carry checkpoint (env states +
        # replay incl. PER sum tree + RNG + n-step window — bit-identical
        # continuation, no warm-up refill) vs the lighter TrainState-only
        # one (2-min cadence). Pick whichever is further along; ties
        # prefer full. The multi-GB full payload is parsed at most ONCE:
        # only the small state checkpoint's meta is peeked for the
        # comparison.
        import os

        fp = checkpoint.full_path(self.cfg)
        sp = checkpoint.state_path(self.cfg)
        state_steps = -1
        if os.path.isfile(sp):
            state_steps = int(checkpoint.peek_meta(sp).get("env_steps", 0))

        if os.path.isfile(fp):
            full_carry, meta = checkpoint.load_full(fp, carry)
            full_steps = int(meta.get("env_steps", 0))
            if full_steps >= state_steps:
                self.resumed = True
                self.full_resumed = True
                self.start_env_steps = full_steps
                print(f"resumed device trainer LOSSLESSLY at "
                      f"{self.start_env_steps} env steps (full checkpoint)")
                return full_carry

        train_state, meta = checkpoint.try_resume(self.cfg, carry.train_state)
        if meta.get("step", 0):
            self.resumed = True
            # Global env-step offset so a resumed run continues the
            # original step accounting (snapshot tags, tensorboard x axis,
            # budget) instead of restarting at 0 — which would re-write
            # _step<N>k_model.pack snapshots with later weights and corrupt
            # the snapshot-sweep checkpoint selection. State checkpoints
            # carry env_steps explicitly; .pack-only resumes derive it from
            # the learner-update count and the replay ratio.
            self.start_env_steps = int(meta.get(
                "env_steps", meta["step"] * self.batch // self.k_updates))
            print(f"resumed device trainer at step {meta['step']} "
                  f"({self.start_env_steps} env steps)")
        return carry._replace(
            train_state=train_state,
            rew_mean=jnp.asarray(meta.get("rew_mean", 0.0), jnp.float32),
            episodes=jnp.asarray(float(meta.get("episode_count", 0))),
        )

    def run(self, log: bool = True) -> Carry:
        cfg = self.cfg
        carry = self.init_carry()
        self.env_steps_done = self.start_env_steps
        run = checkpoint.run_name(cfg)
        if cfg.env.obs_variant != "hybrid":
            run += f"_{cfg.env.obs_variant}"   # variant runs get their own
        writer = MetricsWriter(cfg.hp.log_dir, run + "_device") \
            if log else None

        # Lossless resume restores the replay buffer itself — no refill.
        if not self.full_resumed:
            warm_iters = max(1, cfg.hp.min_mem // self.batch)
            done_warm = 0
            while done_warm < warm_iters:
                n = min(8, warm_iters - done_warm)
                carry = self._warm_chunk(carry, n, self.resumed)
                done_warm += n

        # Budget is GLOBAL env steps (reference train.py:203 semantics:
        # resume continues toward max_total_steps, it does not add a fresh
        # budget on top — pass a larger -max_total_steps to continue past
        # the original budget). Fresh runs keep the >=1-iteration floor so
        # a tiny-budget smoke run still trains instead of silently
        # exporting an untrained pack.
        total_iters = max(0 if self.resumed else 1,
                          (cfg.hp.max_total_steps - self.start_env_steps)
                          // self.batch)
        if self.resumed and total_iters == 0:
            print(f"resumed at {self.start_env_steps} env steps >= budget "
                  f"{cfg.hp.max_total_steps}; nothing to train")
        # Periodic full-state saves (~every 2 min at B=256 steady state) so a
        # host/tunnel failure costs minutes, not the run: the reference saves
        # every save_freq steps (agent.py:123-128); here a full TrainState
        # dump blocks the device pipeline, so cadence is the coarser of the
        # two. Resume with hp.load=True (on-policy warm refill, train.py:68-72).
        save_iters = max(cfg.hp.save_freq // self.batch,
                         self.SAVE_MIN_ITERS) // self.CHUNK * self.CHUNK \
            or self.CHUNK
        t0 = time.time()
        it = 0
        start = self.start_env_steps
        while it < total_iters:
            carry, out = self._train_chunk(carry)
            it += self.CHUNK
            self.env_steps_done = start + it * self.batch
            genv = self.env_steps_done   # GLOBAL env steps incl. resume offset
            if it % save_iters == 0 and it < total_iters:
                self.save(carry)
                # Step-tagged snapshot every SNAPSHOT_EVERY env steps: long
                # runs can regress late (the reference keeps only the last
                # save); tagged packs let eval pick the best checkpoint.
                # Tags are GLOBAL steps: a resumed run continues the
                # sequence instead of re-writing earlier snapshots.
                se = int(os.environ.get("MDRLRMC_SNAPSHOT_EVERY",
                                        self.SNAPSHOT_EVERY))
                if genv // se > (genv - save_iters * self.batch) // se:
                    import shutil
                    pack = checkpoint.pack_path(self.cfg)
                    tag = f"_step{genv // se * se // 1000}k"
                    shutil.copyfile(pack, pack.replace("_model.pack",
                                                       f"{tag}_model.pack"))
                # Lossless full-Carry checkpoints (replay + PER tree + RNG
                # + env states) make kill+resume bit-identical — but
                # pulling the ~2.3 GB HBM replay through the axon tunnel
                # and msgpack-ing it measured ~8 MINUTES of stalled
                # training per save (vs 9 min of training per 1M steps at
                # B=256), and the silent-log window is indistinguishable
                # from a tunnel hang to any watchdog. Opt-in cadence via
                # MDRLRMC_FULL_SAVE_EVERY (env steps; 0 = off): the 2-min
                # TrainState saves + step-tagged packs already bound a
                # crash's cost to minutes (resume refills the buffer
                # on-policy, reference train.py:68-72).
                sf = int(os.environ.get("MDRLRMC_FULL_SAVE_EVERY", "0"))
                if sf > 0 and genv // sf > (genv - save_iters * self.batch) // sf:
                    self.save_full(carry)
            if writer and (it % max(self.CHUNK, (cfg.hp.log_freq // self.batch)
                                    // self.CHUNK * self.CHUNK or self.CHUNK) == 0):
                jax.block_until_ready(out["loss"])
                sps = it * self.batch / max(time.time() - t0, 1e-9)
                writer.scalars(
                    {
                        "AvgRew": float(carry.rew_mean),
                        "Episodes": float(carry.episodes),
                        "loss": float(out["loss"]),
                        "epsilon": float(out["epsilon"]),
                        "cycle_reward": float(out["reward"]),
                        "env_steps_per_sec": sps,
                    },
                    genv,
                )
                print(f"iter {genv}: rew_ema {float(carry.rew_mean):.2f} "
                      f"loss {float(out['loss']):.4f} {sps:.1f} env-steps/s")
        if writer:
            writer.close()
        return carry

    def save(self, carry: Carry) -> None:
        class _S:
            rew_mean = float(carry.rew_mean)
            len_mean = float(self.cfg.env.max_agent_steps_per_episode)
            count = int(carry.episodes)

        checkpoint.save_all(self.cfg, carry.train_state, _S(),
                            extra_meta={"env_steps": int(getattr(
                                self, "env_steps_done",
                                self.start_env_steps))})

    def save_full(self, carry: Carry) -> None:
        """Lossless checkpoint: the entire scanned Carry (env states, obs,
        TrainState, replay buffer incl. PER sum tree, RNG, n-step window)."""
        checkpoint.save_full(
            checkpoint.full_path(self.cfg), carry,
            {"env_steps": int(getattr(self, "env_steps_done",
                                      self.start_env_steps)),
             "rew_mean": float(carry.rew_mean),
             "episode_count": int(carry.episodes),
             "step": int(carry.train_state.step)},
        )


def train_on_device(cfg: Config, seed: int = 0, batch: int | None = None,
                    replay_ratio: float = 1.0) -> None:
    trainer = DeviceTrainer(cfg, batch=batch, seed=seed,
                            replay_ratio=replay_ratio)
    carry = trainer.run()
    trainer.save(carry)
    # The final lossless dump only matters for continuing PAST the budget
    # (resume prefers it over the state save); like the periodic cadence
    # it costs ~8 min of replay pull+serialize, so it rides the same knob.
    if int(os.environ.get("MDRLRMC_FULL_SAVE_EVERY", "0")) > 0:
        trainer.save_full(carry)
    print(f"saved {checkpoint.pack_path(cfg)}")
