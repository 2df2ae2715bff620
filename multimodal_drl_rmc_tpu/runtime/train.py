"""Training driver: host actor loop feeding the device-resident learner.

Behavioral port target: reference ``train.py`` — buffer warm-up with
random (or resumed-greedy) actions (:63-81), then the hot loop
choose -> step -> store -> learn -> target-update -> log -> save (:83-108),
with the same CLI surface (:116-148).

TPU-native differences:
  * the learner is a bundle of jitted pure functions over explicit state
    (agents/dqn.py); store+learn+target-update run as ONE device step with
    donated buffers — no per-step host round-trips beyond the obs batch;
  * ``replay_ratio`` > 1 runs k fused learner updates per env step via
    ``train_many`` (lax.scan), decoupling device utilization from sim
    latency (SURVEY.md §7 'hard parts');
  * resume restores optimizer state too (runtime/checkpoint.py), not just
    weights.
"""

from __future__ import annotations

import argparse
import dataclasses
import time

import jax
import numpy as np

from ..agents.dqn import make_learner
from ..config import ALGO_NAMES, Config, EnvConfig, HyperParams, network_spec_for_variant
from ..envs import GymEnvWrapper, RampEnv, make_env
from ..ops.losses import Batch
from . import checkpoint
from .metrics import EpisodeStats, MetricsWriter, StepTimer


def build_config(args) -> Config:
    env = EnvConfig(obs_variant=args.obs_variant)
    noise = float(getattr(args, "accel_noise", 0.0) or 0.0)
    if noise > 0.0:
        env = dataclasses.replace(
            env, scenario=dataclasses.replace(
                env.scenario, accel_noise_sigma=noise))
    guard = float(getattr(args, "guard_occ", 0.0) or 0.0)
    if guard > 0.0:
        env = dataclasses.replace(
            env, guard_occ=guard, guard_cap=int(getattr(args, "guard_cap", 1)))
    hp = HyperParams(
        n_env=max(1, args.n_env), lr=args.lr, gamma=args.gamma,
        eps_start=args.eps_start, eps_min=args.eps_min, eps_dec=args.eps_dec,
        eps_dec_exp=args.eps_dec_exp, batch_size=args.bs,
        min_mem=args.min_mem, max_mem=args.max_mem,
        target_update_freq=args.target_update_freq,
        target_soft_update=args.target_soft_update,
        target_soft_update_tau=args.target_soft_update_tau,
        save_freq=args.save_freq, log_freq=args.log_freq,
        save_dir=args.save_dir, log_dir=args.log_dir, load=args.load,
        repeat=args.repeat, max_episode_steps=args.max_episode_steps,
        max_total_steps=args.max_total_steps, algo=args.algo,
        n_step=args.n_step, lr_schedule=args.lr_schedule,
        lr_end=args.lr_end, lr_decay_steps=args.lr_decay_steps,
        obs_dtype=getattr(args, "obs_dtype", "float32"),
    )
    net = network_spec_for_variant(args.obs_variant)
    dist_kw = {}
    if getattr(args, "n_atoms", 0):
        dist_kw["n_atoms"] = args.n_atoms
    if getattr(args, "v_min", None) is not None:
        dist_kw["v_min"] = args.v_min
    if getattr(args, "v_max", None) is not None:
        dist_kw["v_max"] = args.v_max
    if dist_kw:
        net = dataclasses.replace(net, **dist_kw)
    return Config(env=env, hp=hp, net=net)


class Trainer:
    def __init__(self, cfg: Config, backend: str = "auto", threaded: bool = True,
                 replay_ratio: int = 1, seed: int = 0, vec: str = "auto"):
        self.cfg = cfg
        hp = cfg.hp
        self.replay_ratio = max(1, replay_ratio)

        def factory():
            return GymEnvWrapper(RampEnv("train", cfg=cfg, backend=backend))

        self.env = make_env(
            factory, repeat=hp.repeat, max_episode_steps=hp.max_episode_steps,
            n_env=hp.n_env, threaded=threaded, vec=vec,
        )
        self.learner = make_learner(cfg)
        self.rng = jax.random.PRNGKey(seed)
        self.state = self.learner.init_state(self._split())
        self.buffer = self.learner.init_buffer()
        self.nstep = None
        self._stage = []
        self._staged = 0
        if hp.n_step > 1:
            from ..ops.nstep import NStepAccumulator

            self.nstep = NStepAccumulator(hp.n_step, hp.gamma, hp.n_env)
        self.stats = EpisodeStats()
        self.metrics = MetricsWriter(hp.log_dir, checkpoint.run_name(cfg))
        self.timer = StepTimer()
        self.resume_step = 0

        self.full_resumed = False
        if hp.load:
            self.state, meta = checkpoint.try_resume(cfg, self.state)
            self.resume_step = int(meta.get("step", 0))
            # Prefer the lossless full checkpoint (state + replay + RNG)
            # when it is at least as far along: resume then continues from
            # the exact buffer instead of a greedy refill. (The host-side
            # n-step FIFO is not persisted — at most n-1 in-flight
            # transitions per env reset on resume; the device trainer is
            # the fully bit-identical path.)
            import os

            fp = checkpoint.full_path(cfg)
            if os.path.isfile(fp):
                fmeta = checkpoint.peek_meta(fp)
                if int(fmeta.get("step", 0)) >= self.resume_step:
                    (self.state, self.buffer, self.rng), meta = \
                        checkpoint.load_full(
                            fp, (self.state, self.buffer, self.rng))
                    self.resume_step = int(meta.get("step", 0))
                    self.full_resumed = True
            self.stats.seed(meta.get("rew_mean", 0.0), meta.get("len_mean", 0.0),
                            meta.get("episode_count", 0))
            if self.resume_step:
                print(f"resumed at step {self.resume_step} "
                      f"(rew_mean {meta.get('rew_mean', 0):.2f}"
                      f"{', lossless' if self.full_resumed else ''})")

    def _split(self) -> jax.Array:
        self.rng, key = jax.random.split(self.rng)
        return key

    # ------------------------------------------------------------------
    def _env_step(self, obses: np.ndarray, actions: np.ndarray) -> np.ndarray:
        """One vectorized env transition stored into HBM replay. Returns the
        next obs batch. Bootstrapping uses terminated only (truncation is
        not an MDP terminal) and the pre-reset final obs from auto-reset."""
        with self.timer.phase("sim"):
            new_obses, rews, terms, truncs, infos = self.env.step(np.asarray(actions))
        next_obs = new_obses
        if any(t or u for t, u in zip(terms, truncs)):
            next_obs = new_obses.copy()
            for i, info in enumerate(infos):
                if "final_obs" in info:
                    next_obs[i] = info["final_obs"]
        self.stats.push_from_infos(infos)
        with self.timer.phase("insert"):
            if self.nstep is not None:
                batch = self.nstep.push(
                    obses, np.asarray(actions), np.asarray(rews),
                    np.asarray(terms), next_obs, truncated=np.asarray(truncs),
                )
                # Emission counts vary; insert in fixed n_env-sized chunks
                # so the jitted insert compiles exactly once.
                if batch is not None:
                    self._stage.append(batch)
                    self._staged += batch.obs.shape[0]
                n = self.cfg.hp.n_env
                while self._staged >= n:
                    big = Batch(*(np.concatenate([getattr(b, f) for b in self._stage])
                                  for f in Batch._fields))
                    chunk = Batch(*(arr[:n] for arr in big))
                    rest = Batch(*(arr[n:] for arr in big))
                    self.buffer = self.learner.insert(self.buffer, chunk)
                    self._stage = [rest] if rest.obs.shape[0] else []
                    self._staged -= n
            else:
                batch = Batch(
                    obs=obses,
                    action=np.asarray(actions, np.int32),
                    reward=np.asarray(rews, np.float32),
                    done=np.asarray(terms, np.float32),
                    next_obs=next_obs,
                )
                self.buffer = self.learner.insert(self.buffer, batch)
        return new_obses

    def warmup(self) -> np.ndarray:
        hp = self.cfg.hp
        obses = self.env.reset()
        if self.full_resumed:
            print("warm-up skipped: replay restored from full checkpoint")
            return obses
        iters = hp.min_mem // hp.n_env
        print(f"warm-up: {iters} vec steps ({hp.min_mem} transitions)")
        t0 = time.time()
        for t in range(iters):
            if t >= iters - self.resume_step:
                # Resumed runs refill with on-policy greedy actions
                # (reference train.py:68-72).
                actions = np.asarray(self.learner.greedy_actions(self.state.params, obses))
            else:
                actions = np.random.randint(0, self.cfg.env.n_actions, size=hp.n_env)
            obses = self._env_step(obses, actions)
            if (t + 1) % max(1, 10_000 // hp.n_env) == 0:
                print(f"  {(t + 1) * hp.n_env} / {hp.min_mem} "
                      f"({time.time() - t0:.0f}s)")
        return obses

    def train(self, obses: np.ndarray) -> None:
        hp = self.cfg.hp
        print("training")
        step = int(self.state.step)
        last_save = step
        while True:
            with self.timer.phase("act"):
                actions = np.asarray(
                    self.learner.select_actions(self.state, obses, self._split())
                )
            obses = self._env_step(obses, actions)
            with self.timer.phase("learn"):
                if self.replay_ratio == 1:
                    self.state, self.buffer, metrics = self.learner.train_step(
                        self.state, self.buffer, self._split()
                    )
                else:
                    self.state, self.buffer, metrics = self.learner.train_many(
                        self.state, self.buffer, self._split(), self.replay_ratio
                    )
            step = int(self.state.step)

            if hp.log_freq and step % hp.log_freq < self.replay_ratio:
                with self.timer.phase("log"):
                    jax.block_until_ready(metrics.loss)
                    self.metrics.scalars(
                        {
                            "AvgRew": self.stats.rew_mean,
                            "AvgEpLen": self.stats.len_mean,
                            "Episodes": self.stats.count,
                            "loss": float(metrics.loss),
                            "epsilon": float(metrics.epsilon),
                            **self.timer.snapshot(),
                        },
                        step * hp.n_env,
                    )
                    print(f"step {step * hp.n_env}: AvgRew {self.stats.rew_mean:.2f} "
                          f"eps {float(metrics.epsilon):.3f} loss {float(metrics.loss):.4f}")
            if hp.save_freq and step - last_save >= hp.save_freq:
                checkpoint.save_all(self.cfg, self.state, self.stats)
                self._n_saves = getattr(self, "_n_saves", 0) + 1
                # Full (replay-inclusive) checkpoint every 10th quick save:
                # the buffer can be GBs, so it rides a coarser cadence.
                if self._n_saves % 10 == 0:
                    self._save_full()
                last_save = step
            if hp.max_total_steps and step * hp.n_env >= hp.max_total_steps:
                break
        checkpoint.save_all(self.cfg, self.state, self.stats)
        self._save_full()
        self.env.close()
        self.metrics.close()

    def _save_full(self) -> None:
        checkpoint.save_full(
            checkpoint.full_path(self.cfg),
            (self.state, self.buffer, self.rng),
            {"step": int(self.state.step),
             "env_steps": int(self.state.step) * self.cfg.hp.n_env,
             "rew_mean": self.stats.rew_mean,
             "len_mean": self.stats.len_mean,
             "episode_count": self.stats.count},
        )

    def run(self) -> None:
        obses = self.warmup()
        self.train(obses)


# ---------------------------------------------------------------------------
# CLI (reference train.py:116-148 flag surface + backend/variant extensions)
# ---------------------------------------------------------------------------

def str2bool(v: str) -> bool:
    return str(v).lower() in ("yes", "y", "true", "t", "1")


def add_common_args(parser: argparse.ArgumentParser, hp: HyperParams) -> None:
    parser.add_argument("-gpu", type=str, default="0", help="ignored (TPU build)")
    parser.add_argument("-n_env", type=int, default=hp.n_env)
    parser.add_argument("-lr", type=float, default=hp.lr)
    parser.add_argument("-gamma", type=float, default=hp.gamma)
    parser.add_argument("-eps_start", type=float, default=hp.eps_start)
    parser.add_argument("-eps_min", type=float, default=hp.eps_min)
    parser.add_argument("-eps_dec", type=float, default=hp.eps_dec)
    parser.add_argument("-eps_dec_exp", type=str2bool, default=hp.eps_dec_exp)
    parser.add_argument("-bs", type=int, default=hp.batch_size)
    parser.add_argument("-min_mem", type=int, default=hp.min_mem)
    parser.add_argument("-max_mem", type=int, default=hp.max_mem)
    parser.add_argument("-target_update_freq", type=int, default=hp.target_update_freq)
    parser.add_argument("-target_soft_update", type=str2bool, default=hp.target_soft_update)
    parser.add_argument("-target_soft_update_tau", type=float, default=hp.target_soft_update_tau)
    parser.add_argument("-save_freq", type=int, default=hp.save_freq)
    parser.add_argument("-log_freq", type=int, default=hp.log_freq)
    parser.add_argument("-save_dir", type=str, default=hp.save_dir)
    parser.add_argument("-log_dir", type=str, default=hp.log_dir)
    parser.add_argument("-load", type=str2bool, default=hp.load)
    parser.add_argument("-repeat", type=int, default=hp.repeat)
    parser.add_argument("-max_episode_steps", type=int, default=hp.max_episode_steps)
    parser.add_argument("-max_total_steps", type=int, default=hp.max_total_steps)
    parser.add_argument("-algo", type=str, default=hp.algo,
                        help=" ".join(ALGO_NAMES))
    parser.add_argument("-backend", type=str, default="auto",
                        choices=("auto", "fake", "native", "sumo", "device"))
    parser.add_argument("-obs_variant", type=str, default="hybrid",
                        choices=("hybrid", "macro_lane", "macro_no_lane"))
    parser.add_argument("-replay_ratio", type=float, default=1.0,
                        help="learner updates per env transition "
                             "(host path rounds up to an int per vec step)")
    parser.add_argument("-lr_schedule", type=str, default=hp.lr_schedule,
                        choices=("const", "cosine"),
                        help="cosine decays lr over lr_decay_steps learner "
                             "updates (0 = max_total_steps)")
    parser.add_argument("-lr_end", type=float, default=hp.lr_end)
    parser.add_argument("-lr_decay_steps", type=int, default=hp.lr_decay_steps)
    parser.add_argument("-n_step", type=int, default=1,
                        help="n-step returns (1 = reference behavior)")
    parser.add_argument("-threaded", type=str2bool, default=True)
    parser.add_argument("-vec", type=str, default="auto",
                        choices=("auto", "serial", "thread", "process"),
                        help="vec-env worker model; 'process' = spawn+pipe "
                             "workers (reference SubprocVecEnv) for "
                             "GIL-holding backends like libsumo")
    parser.add_argument("-seed", type=int, default=0)
    parser.add_argument("-seeds", type=str, default="",
                        help="comma-separated seed list: train K independent "
                             "seeds in ONE vmapped XLA program (device "
                             "backend only). Per-seed outputs go to "
                             "<save_dir>/s<seed>/ (or a literal {seed} "
                             "placeholder in -save_dir/-log_dir).")
    parser.add_argument("-accel_noise", type=float, default=0.0,
                        help="driver-imperfection accel noise sigma (m/s^2) "
                             "during training; stress/robustness protocol "
                             "(BENCHMARKS 'Driver-noise mode'). The noise "
                             "rides the fused Pallas kernel as a pre-drawn "
                             "input.")
    parser.add_argument("-obs_dtype", type=str, default=hp.obs_dtype,
                        choices=("float32", "bfloat16", "float16"),
                        help="replay storage dtype for obs/next_obs (insert "
                             "casts down, sample casts back to f32). At the "
                             "hybrid 284-float obs the f32 pair is ~3.1 GB "
                             "padded per 1M-transition seed in HBM — bf16 "
                             "halves that, which is what lets -seeds K=4 "
                             "fit a 16 GB v5e at full capacity.")
    parser.add_argument("-guard_occ", type=float, default=0.0,
                        help="env-side safety envelope during TRAINING "
                             "(EnvConfig.guard_occ; 0 = off): cap greens at "
                             "action index -guard_cap while last-cycle merge "
                             "occupancy > this percent. Same trigger/clamp "
                             "as evaluate.py --guard-occ, but in the loop — "
                             "the policy learns the guarded MDP.")
    parser.add_argument("-guard_cap", type=int, default=1,
                        help="action-index cap while the training guard is "
                             "active (1 = 10 s green, matching the deployed "
                             "guard(20, cap 1) recommendation)")
    parser.add_argument("-profile", type=str, default="",
                        help="write a jax.profiler trace (xprof) to this dir")
    # Distributional-head hyperparameters (C51/QR agents only; ignored by
    # the scalar zoo). 0 keeps the NetworkSpec default (51 atoms,
    # support [-30, 45] calibrated to the flagship's observed Q range).
    parser.add_argument("-n_atoms", type=int, default=0,
                        help="C51 atoms / QR quantiles (0 = spec default)")
    parser.add_argument("-v_min", type=float, default=None,
                        help="C51 support lower bound")
    parser.add_argument("-v_max", type=float, default=None,
                        help="C51 support upper bound")


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description="TRAIN (TPU)")
    add_common_args(parser, HyperParams())
    args = parser.parse_args(argv)
    cfg = build_config(args)
    print("TRAIN", args.algo)
    import contextlib

    import jax as _jax

    profile_cm = (_jax.profiler.trace(args.profile)
                  if args.profile else contextlib.nullcontext())
    with profile_cm:
        if args.seeds:
            if args.backend != "device":
                raise SystemExit("-seeds (vmapped multi-seed training) "
                                 "requires -backend device")
            from ..sim.train_multiseed import train_multiseed

            seeds = [int(s) for s in args.seeds.split(",") if s.strip()]
            train_multiseed(cfg, seeds,
                            replay_ratio=float(args.replay_ratio))
            return
        if args.backend == "device":
            from ..sim.train_on_device import train_on_device

            train_on_device(cfg, seed=args.seed,
                            replay_ratio=float(args.replay_ratio))
            return
        Trainer(cfg, backend=args.backend, threaded=args.threaded,
                replay_ratio=int(round(args.replay_ratio)), seed=args.seed,
                vec=args.vec).run()


if __name__ == "__main__":
    main()
