"""Gymnasium adapter + episode CSV logger.

Behavioral port target: reference ``CustomEnvWrapper`` (dqn/env_wrap.py:9-151)
— Discrete/Box spaces, float32 coercion, total-reward accounting, gymnasium
5-tuple step API, and the buffered per-episode ``log_info_writer`` CSV dump
that evaluate.py's ``parse_framework_log`` consumes.

One deliberate fix vs the reference: the whole stack (this wrapper, the
vector envs in envs/vector.py, and the drivers) speaks the gymnasium 5-tuple
uniformly — the reference's vendored Monitor/SubprocVecEnv still unpack the
legacy 4-tuple (SURVEY.md §2 API-schism note).
"""

from __future__ import annotations

import os
from csv import DictWriter

import gymnasium as gym
import numpy as np
from gymnasium import spaces


class GymEnvWrapper(gym.Env):
    metadata = {"render_modes": ["human"]}

    def __init__(self, ramp_env):
        super().__init__()
        self.ramp_env = ramp_env
        self.mode = ramp_env.mode
        self.player = ramp_env.player

        self.steps = 0
        self.total_reward = 0.0

        n_obs = ramp_env.observation_space_n
        obs_shape = (n_obs,) if isinstance(n_obs, int) else tuple(n_obs)
        self.action_space = spaces.Discrete(ramp_env.action_space_n)
        self.observation_space = spaces.Box(0.0, 1.0, shape=obs_shape, dtype=np.float32)

        self.log_info_buffer: list = []

    def get_env(self):
        return self.ramp_env

    def _obs(self) -> np.ndarray:
        obs = self.ramp_env.obs()
        obs = np.asarray(obs, dtype=np.float32)
        return obs

    def _info(self) -> dict:
        info = {"l": self.steps, "r": self.total_reward}
        if not self.mode["train"]:
            detailed = self.ramp_env.info()
            if detailed:
                info.update(detailed)
        return info

    def reset(self, *, seed=None, options=None):
        super().reset(seed=seed)
        self.steps = 0
        self.total_reward = 0.0
        self.ramp_env.reset(seed)
        return self._obs(), self._info()

    def step(self, action):
        result = self.ramp_env.step(action)
        self.steps += 1
        if isinstance(result, tuple) and len(result) == 4:
            _, rew, terminated, _ = result
        else:
            rew, terminated = self.ramp_env.rew(), self.ramp_env.done()
        self.total_reward += rew
        return self._obs(), rew, bool(terminated), False, self._info()

    def render(self):
        pass

    def close(self):
        self.ramp_env.close()

    # ------------------------------------------------------------------
    # Buffered per-episode CSV (reference env_wrap.py:119-144). The row
    # schema is whatever the info dict contains, sorted — identical policy
    # to the reference so parse_framework_log reads both.
    # ------------------------------------------------------------------
    def log_info_writer(self, info: dict, done: bool, log: bool, log_step: int, log_path: str):
        if not (log and (done or (log_step > 0 and info.get("l", 0) % log_step == 0))):
            return
        info = dict(info)
        info.setdefault("TimeLimit.truncated", False)
        info["done"] = done
        self.log_info_buffer.append(info)
        if done:
            file_exists = os.path.isfile(log_path)
            os.makedirs(os.path.dirname(log_path) or ".", exist_ok=True)
            fieldnames = sorted(info.keys())
            with open(log_path, "a", newline="") as f:
                writer = DictWriter(f, delimiter=",", lineterminator="\n", fieldnames=fieldnames)
                if not file_exists:
                    writer.writeheader()
                for row in self.log_info_buffer:
                    writer.writerow({k: row.get(k) for k in fieldnames})
            self.log_info_buffer = []


class RepeatActionWrapper(gym.Wrapper):
    """Repeat each chosen action ``repeat`` times, summing rewards
    (reference baselines_wrappers/wrappers.py:4-21, gymnasium API)."""

    def __init__(self, env, repeat: int):
        super().__init__(env)
        self.repeat = max(1, repeat)

    def step(self, action):
        total = 0.0
        terminated = truncated = False
        obs, info = None, {}
        for _ in range(self.repeat):
            obs, rew, terminated, truncated, info = self.env.step(action)
            total += rew
            if terminated or truncated:
                break
        return obs, total, terminated, truncated, info


class MaxEpisodeStepsWrapper(gym.Wrapper):
    """Truncate after N steps (reference wrappers.py:24-43), reported via the
    gymnasium ``truncated`` flag instead of info['TimeLimit.truncated']."""

    def __init__(self, env, max_episode_steps: int):
        super().__init__(env)
        self.max_episode_steps = max_episode_steps
        self._elapsed = 0

    def reset(self, **kwargs):
        self._elapsed = 0
        return self.env.reset(**kwargs)

    def step(self, action):
        obs, rew, terminated, truncated, info = self.env.step(action)
        self._elapsed += 1
        if self._elapsed >= self.max_episode_steps and not terminated:
            truncated = True
            info["TimeLimit.truncated"] = True
        return obs, rew, terminated, truncated, info
