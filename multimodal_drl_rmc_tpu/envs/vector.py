"""Vectorized environments: the actor-pool replacement for SubprocVecEnv.

The reference vendors OpenAI-baselines' process-based vec-env stack
(dqn/utils/baselines_wrappers/: VecEnv ABC, DummyVecEnv, SubprocVecEnv with
one pipe per worker) but can never use it — the module-global ``traci``
limits it to n_env=1 (SURVEY.md §2). Here every env owns its backend, so:

  * ``SerialVecEnv``  — in-process loop (DummyVecEnv equivalent);
  * ``ThreadVecEnv``  — a persistent thread per env. Suited to backends
    whose step releases the GIL (the native C++ sim) or blocks on IO (TraCI
    sockets); both are the actual workloads. For pure-Python fake backends
    it degrades gracefully to serial speed.

Both speak the gymnasium 5-tuple and auto-reset on termination, returning
the final observation under ``info['final_obs']`` (the learner stores the
pre-reset transition; matching modern gymnasium vec semantics rather than
the reference's stale 4-tuple Monitor path).

``Monitor`` keeps episode return/length stats (reference
baselines_wrappers/monitor.py:41-65) without the CSV side effects.
"""

from __future__ import annotations

import threading
import time
from typing import Callable, Sequence

import numpy as np


class Monitor:
    """Episode stats wrapper (gymnasium API)."""

    def __init__(self, env):
        self.env = env
        self.episode_returns: list[float] = []
        self.episode_lengths: list[int] = []
        self._ret = 0.0
        self._len = 0
        self._t0 = time.time()

    def __getattr__(self, name):
        return getattr(self.env, name)

    def reset(self, **kwargs):
        self._ret = 0.0
        self._len = 0
        return self.env.reset(**kwargs)

    def step(self, action):
        obs, rew, terminated, truncated, info = self.env.step(action)
        self._ret += rew
        self._len += 1
        if terminated or truncated:
            ep = {"r": round(self._ret, 6), "l": self._len,
                  "t": round(time.time() - self._t0, 6)}
            self.episode_returns.append(self._ret)
            self.episode_lengths.append(self._len)
            info = dict(info)
            info["episode"] = ep
        return obs, rew, terminated, truncated, info

    def close(self):
        self.env.close()


class VecEnv:
    """Batched env API: reset() -> [N, D]; step([N]) -> 5-tuple of arrays."""

    num_envs: int
    observation_space = None
    action_space = None

    def reset(self, seed: int | None = None) -> np.ndarray:
        raise NotImplementedError

    def step(self, actions: Sequence[int]):
        raise NotImplementedError

    def close(self) -> None:
        raise NotImplementedError


def _auto_reset(env, obs, rew, terminated, truncated, info):
    if terminated or truncated:
        info = dict(info)
        info["final_obs"] = obs
        obs, _ = env.reset()
    return obs, rew, terminated, truncated, info


class SerialVecEnv(VecEnv):
    def __init__(self, env_fns: Sequence[Callable]):
        self.envs = [fn() for fn in env_fns]
        self.num_envs = len(self.envs)
        self.observation_space = self.envs[0].observation_space
        self.action_space = self.envs[0].action_space

    def reset(self, seed: int | None = None) -> np.ndarray:
        obses = []
        for i, env in enumerate(self.envs):
            obs, _ = env.reset(seed=None if seed is None else seed + i)
            obses.append(obs)
        return np.stack(obses)

    def step(self, actions):
        obses, rews, terms, truncs, infos = [], [], [], [], []
        for env, action in zip(self.envs, actions):
            out = _auto_reset(env, *env.step(action))
            obs, rew, terminated, truncated, info = out
            obses.append(obs)
            rews.append(rew)
            terms.append(terminated)
            truncs.append(truncated)
            infos.append(info)
        return (
            np.stack(obses),
            np.asarray(rews, np.float32),
            np.asarray(terms, bool),
            np.asarray(truncs, bool),
            infos,
        )

    def close(self):
        for env in self.envs:
            env.close()


class _Worker(threading.Thread):
    """Persistent worker thread owning one env; request/reply via events."""

    def __init__(self, env_fn):
        super().__init__(daemon=True)
        self.env_fn = env_fn
        self.env = None
        self.cmd = None
        self.arg = None
        self.result = None
        self.error = None
        self._req = threading.Event()
        self._done = threading.Event()
        self.start()
        self.call("init", None)

    def call(self, cmd, arg):
        self.cmd, self.arg, self.error = cmd, arg, None
        self._done.clear()
        self._req.set()

    def wait(self):
        self._done.wait()
        if self.error is not None:
            raise self.error
        return self.result

    def run(self):
        while True:
            self._req.wait()
            self._req.clear()
            try:
                if self.cmd == "init":
                    self.env = self.env_fn()
                    self.result = None
                elif self.cmd == "reset":
                    obs, _ = self.env.reset(seed=self.arg)
                    self.result = obs
                elif self.cmd == "step":
                    self.result = _auto_reset(self.env, *self.env.step(self.arg))
                elif self.cmd == "close":
                    self.env.close()
                    self.result = None
                    self._done.set()
                    return
            except Exception as e:  # surfaced on wait()
                self.error = e
            self._done.set()


class ThreadVecEnv(VecEnv):
    def __init__(self, env_fns: Sequence[Callable]):
        self.workers = [_Worker(fn) for fn in env_fns]
        for w in self.workers:
            w.wait()
        self.num_envs = len(self.workers)
        self.observation_space = self.workers[0].env.observation_space
        self.action_space = self.workers[0].env.action_space

    def reset(self, seed: int | None = None) -> np.ndarray:
        for i, w in enumerate(self.workers):
            w.call("reset", None if seed is None else seed + i)
        return np.stack([w.wait() for w in self.workers])

    def step(self, actions):
        for w, action in zip(self.workers, actions):
            w.call("step", action)
        results = [w.wait() for w in self.workers]
        obses, rews, terms, truncs, infos = zip(*results)
        return (
            np.stack(obses),
            np.asarray(rews, np.float32),
            np.asarray(terms, bool),
            np.asarray(truncs, bool),
            list(infos),
        )

    def close(self):
        for w in self.workers:
            w.call("close", None)
        for w in self.workers:
            w._done.wait()


class CloudpickleWrapper:
    """Ship arbitrary callables (closures) across a spawn boundary
    (reference baselines_wrappers/vec_env.py:163-178)."""

    def __init__(self, fn):
        self.fn = fn

    def __getstate__(self):
        import cloudpickle

        return cloudpickle.dumps(self.fn)

    def __setstate__(self, blob):
        import pickle

        self.fn = pickle.loads(blob)

    def __call__(self):
        return self.fn()


def _clear_mpi_env_vars() -> dict:
    """Strip OMPI_*/PMI_* before spawning workers (reference
    vec_env.py:180-196 — MPI thinks forked children are MPI ranks).
    Returns the removed vars so the parent can restore them."""
    import os

    removed = {}
    for k in list(os.environ):
        if k.startswith(("OMPI_", "PMI_")):
            removed[k] = os.environ.pop(k)
    return removed


def _proc_worker(pipe, parent_pipe, wrapped_fn):
    """Worker-process loop (reference subproc_vec_env.py:7-36, migrated to
    the gymnasium 5-tuple + auto-reset with info['final_obs'])."""
    parent_pipe.close()
    env = wrapped_fn()
    try:
        while True:
            cmd, arg = pipe.recv()
            if cmd == "step":
                pipe.send(_auto_reset(env, *env.step(arg)))
            elif cmd == "reset":
                obs, _ = env.reset(seed=arg)
                pipe.send(obs)
            elif cmd == "get_spaces":
                pipe.send((env.observation_space, env.action_space))
            elif cmd == "close":
                env.close()
                pipe.send(None)
                break
    except (KeyboardInterrupt, EOFError):
        pass
    finally:
        pipe.close()


class ProcessVecEnv(VecEnv):
    """Spawn-context worker processes, one pipe each (reference
    SubprocVecEnv, subproc_vec_env.py:39-112). Use for backends that hold
    the GIL — libsumo's in-process stepping and CPU-bound pure-Python envs
    — where ThreadVecEnv serializes; for the GIL-releasing native C++ sim
    threads are cheaper (no pickling of obs batches)."""

    def __init__(self, env_fns: Sequence[Callable]):
        import multiprocessing as mp

        ctx = mp.get_context("spawn")
        self.closed = False
        self.parent_pipes = []
        self.procs = []
        removed = _clear_mpi_env_vars()
        try:
            for fn in env_fns:
                parent, child = ctx.Pipe()
                proc = ctx.Process(
                    target=_proc_worker,
                    args=(child, parent, CloudpickleWrapper(fn)),
                    daemon=True,
                )
                proc.start()
                child.close()
                self.parent_pipes.append(parent)
                self.procs.append(proc)
        finally:
            import os

            os.environ.update(removed)
        self.num_envs = len(self.procs)
        self.parent_pipes[0].send(("get_spaces", None))
        self.observation_space, self.action_space = self.parent_pipes[0].recv()

    def _assert_not_closed(self):
        assert not self.closed, "operation on a closed ProcessVecEnv"

    def reset(self, seed: int | None = None) -> np.ndarray:
        self._assert_not_closed()
        for i, pipe in enumerate(self.parent_pipes):
            pipe.send(("reset", None if seed is None else seed + i))
        return np.stack([pipe.recv() for pipe in self.parent_pipes])

    def step(self, actions):
        self._assert_not_closed()
        for pipe, action in zip(self.parent_pipes, actions):
            pipe.send(("step", action))
        results = [pipe.recv() for pipe in self.parent_pipes]
        obses, rews, terms, truncs, infos = zip(*results)
        return (
            np.stack(obses),
            np.asarray(rews, np.float32),
            np.asarray(terms, bool),
            np.asarray(truncs, bool),
            list(infos),
        )

    def close(self):
        if self.closed:
            return
        self.closed = True
        for pipe in self.parent_pipes:
            try:
                pipe.send(("close", None))
                pipe.recv()
            except (BrokenPipeError, EOFError):
                pass
            pipe.close()
        for proc in self.procs:
            proc.join(timeout=10)
            if proc.is_alive():
                proc.terminate()


def make_env(
    env_factory: Callable,
    repeat: int = 0,
    max_episode_steps: int = 0,
    n_env: int = 0,
    threaded: bool = True,
    vec: str = "auto",
):
    """Factory mirroring reference ``make_env`` (dqn/env_make.py:19-29):
    n_env == 0 returns the raw (wrapped) env; otherwise a vec env of
    Monitor-wrapped envs. ``vec`` picks the worker model explicitly
    ('serial' | 'thread' | 'process'); 'auto' keeps the legacy mapping
    (threaded -> threads, else serial)."""
    from .wrapper import MaxEpisodeStepsWrapper, RepeatActionWrapper

    def build():
        env = env_factory()
        if repeat > 0:
            env = RepeatActionWrapper(env, repeat)
        if max_episode_steps > 0:
            env = MaxEpisodeStepsWrapper(env, max_episode_steps)
        return env

    if n_env == 0:
        return build()

    def monitored():
        return Monitor(build())

    fns = [monitored for _ in range(n_env)]
    if vec == "auto":
        vec = "thread" if (threaded and n_env > 1) else "serial"
    cls = {"serial": SerialVecEnv, "thread": ThreadVecEnv,
           "process": ProcessVecEnv}[vec]
    return cls(fns)
