"""Mode-switching env adapter + backend factory.

Behavioral port target: reference ``DqnEnv`` (env/dqn_env.py:6-93) — the
train/observe/play mode switch choosing the RL controller vs a named
baseline — generalized with an explicit backend choice instead of the
hard-wired global SUMO connection.
"""

from __future__ import annotations

from ..config import Config, EnvConfig
from .backend import TrafficBackend
from .baselines import BASELINES
from .fake_backend import FakeTrafficBackend
from .rl_controller import RampMeterEnv
from .scenario import get_scenario


def make_backend(
    env_cfg: EnvConfig,
    backend: str = "auto",
    *,
    gui: bool = False,
    data_dir: str | None = None,
) -> TrafficBackend:
    """Construct a traffic backend.

    backend: 'fake' | 'native' | 'sumo' | 'auto'. 'auto' prefers the native
    C++ microsim, then SUMO/TraCI, then the scripted fake.
    """
    spec = get_scenario(env_cfg.scenario.name)
    if backend in ("native", "auto"):
        try:
            from .backends.native import NativeSimBackend

            return NativeSimBackend(env_cfg.scenario, spec)
        except Exception:
            if backend == "native":
                raise
    if backend in ("sumo", "auto"):
        try:
            from .backends.traci_backend import TraciBackend

            return TraciBackend(env_cfg.scenario, spec, gui=gui, data_dir=data_dir)
        except Exception:
            if backend == "sumo":
                raise
    return FakeTrafficBackend(env_cfg.scenario, spec)


class RampEnv:
    """Train/observe/play switch (reference dqn_env.py:11-24).

    * train   -> RampMeterEnv, headless, no logging
    * observe -> RampMeterEnv, gui if configured, logging on
    * play    -> named baseline controller (or 'Test' -> RL controller)
    """

    def __init__(
        self,
        mode: str,
        player: str | None = None,
        cfg: Config | None = None,
        backend: str | TrafficBackend = "auto",
        gui: bool = False,
    ):
        cfg = cfg or Config()
        self.cfg = cfg
        self.mode = {"train": False, "observe": False, "play": False, mode: True}
        self.player = player if self.mode["play"] else None

        if isinstance(backend, TrafficBackend):
            b = backend
        else:
            b = make_backend(cfg.env, backend, gui=gui and not self.mode["train"])

        if self.mode["play"] and player and player != "Test":
            self.sim_env = BASELINES[player](b, cfg.env, log=True)
        else:
            self.sim_env = RampMeterEnv(b, cfg.env, log=self.mode["observe"])

        self.action_space_n = self.sim_env.action_space_n
        self.observation_space_n = self.sim_env.observation_space_n

    def obs(self):
        return self.sim_env.obs()

    def rew(self):
        return self.sim_env.rew()

    def done(self):
        return self.sim_env.done()

    def info(self):
        return self.sim_env.info()

    def reset(self, seed=None):
        return self.sim_env.reset(seed)

    def step(self, action):
        return self.sim_env.step(action)

    def get_scenario_info(self):
        return self.sim_env.get_scenario_info()

    def close(self):
        self.sim_env.close()
