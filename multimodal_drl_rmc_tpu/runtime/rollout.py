"""Greedy-policy and baseline rollout harnesses.

Behavioral port targets: reference ``observe.py`` (greedy rollout of a
trained .pack, algo+lr parsed from the filename, :11-93), ``play.py``
(named baseline, :7-60), and the ``CustomView`` run-loop they both extend
(env/view.py:126-165). The view scaffold collapses into a plain episode
loop — there is no pyglet path to keep alive (reference has it disabled,
view.py:2)."""

from __future__ import annotations

import jax
import numpy as np

from ..config import Config, EnvConfig, network_spec_for_variant
from ..envs import GymEnvWrapper, RampEnv
from ..envs.wrapper import MaxEpisodeStepsWrapper
from .. import guard
from ..models import packio
from ..models.networks import build_network, greedy_fn


def _wrap(env: GymEnvWrapper, max_steps: int):
    return MaxEpisodeStepsWrapper(env, max_steps) if max_steps > 0 else env


def infer_spec_for_pack(model_path: str, obs_variant: str = "hybrid",
                        n_actions: int = 8):
    """NetworkSpec for a .pack checkpoint, inferred from its filename algo
    (+ head width for C51/QR, whose atom count is a spec knob the filename
    does not carry). Shared by PolicyRunner and the on-device evaluator
    (sim/eval_on_device.py) so both rebuild the identical network."""
    algo, _lr = packio.parse_pack_filename(model_path)
    spec = network_spec_for_variant(obs_variant)
    dueling = "Dueling" in algo
    noisy = algo.startswith("Noisy")
    base_algo = algo[len("Noisy"):] if noisy else algo
    n_atoms, kind = 1, spec.dist_kind
    if base_algo.startswith(("C51", "Qr")):
        n_atoms = packio.peek_head_width(model_path) // n_actions
        kind = "qr" if base_algo.startswith("Qr") else "c51"
    elif base_algo.startswith("Iqn"):
        # IQN taus are inputs, so the head width is just n_actions and
        # the eval quantile count is a free choice — use the training
        # default (spec_for_algo's 51-midpoint grid).
        n_atoms, kind = 51, "iqn"
    if spec.dueling != dueling or spec.n_atoms != n_atoms \
            or spec.dist_kind != kind or spec.noisy != noisy:
        spec = type(spec)(**{**spec.__dict__, "dueling": dueling,
                             "n_atoms": n_atoms, "dist_kind": kind,
                             "noisy": noisy})
    return spec


class PolicyRunner:
    """Greedy rollout of a .pack checkpoint (reference Observe)."""

    def __init__(self, model_path: str, *, backend: str = "auto",
                 obs_variant: str = "hybrid", cfg: Config | None = None,
                 gui: bool = False, max_steps: int = 0,
                 log: bool = False, log_step: int = 0, log_dir: str = "./logs/test/",
                 guard_occ: float = 0.0, guard_cap: int = 3):
        algo, lr = packio.parse_pack_filename(model_path)
        base_cfg = cfg or Config()
        dueling = "Dueling" in algo
        spec = infer_spec_for_pack(model_path, obs_variant,
                                   base_cfg.env.n_actions)
        self.cfg = base_cfg.replace(net=spec)
        if self.cfg.env.obs_variant != obs_variant:
            self.cfg = self.cfg.replace(
                env=EnvConfig(**{**self.cfg.env.__dict__, "obs_variant": obs_variant})
            )

        self.inner = GymEnvWrapper(RampEnv("observe", cfg=self.cfg, backend=backend, gui=gui))
        self.env = _wrap(self.inner, max_steps)
        self.net = build_network(spec, self.cfg.env.n_actions)
        self.params, self.meta = packio.load_pack(model_path, spec, dueling)
        self._greedy = jax.jit(greedy_fn(self.net))
        model_pack = model_path.split("/")[-1].split("_model.pack")[0]
        self.log = (log, log_step, log_dir + model_pack)
        # Safety envelope (off when guard_occ == 0): while the previous
        # cycle's merge-area occupancy exceeds guard_occ (percent — ALINEA's
        # occ_crit=17 is the natural setting, envs/baselines.py), cap the
        # policy's green at action index guard_cap (default 3 = 20 s). A
        # runtime guard against the razor-edge collapse mode: breakdown
        # needs SUSTAINED permissive greens at high occupancy, which the
        # envelope forbids while leaving low-occupancy cycles untouched
        # (BENCHMARKS "noise stress test").
        self.guard_occ = float(guard_occ)
        self.guard_cap = int(guard_cap)
        self._last_occ = 0.0

    def action(self, obs: np.ndarray) -> int:
        a = int(self._greedy(self.params, np.asarray(obs, np.float32)[None])[0])
        return int(guard.clamp(a, self._last_occ, self.guard_occ,
                               self.guard_cap))

    def run_episode(self, seed: int | None = None) -> dict:
        obs, info = self.env.reset(seed=seed)
        self._last_occ = 0.0
        done = False
        while not done:
            obs, _, terminated, truncated, info = self.env.step(self.action(obs))
            done = terminated or truncated
            self._last_occ = float(
                info.get("mainline_occ_mergeArea_percent", 0.0))
            self.inner.log_info_writer(info, done, *self.log)
        return info

    def run(self, max_episodes: int = 1) -> list[dict]:
        out = []
        for ep in range(max_episodes):
            info = self.run_episode()
            print(f"episode {ep + 1}: r={info.get('r', 0):.2f} l={info.get('l', 0)}")
            out.append(info)
        self.env.close()
        return out

    def get_scenario_info(self) -> dict:
        return self.inner.get_env().get_scenario_info()

    def close(self) -> None:
        self.env.close()


class BaselineRunner:
    """Run a named baseline controller (reference Play)."""

    def __init__(self, player: str, *, backend: str = "auto",
                 cfg: Config | None = None, gui: bool = False, max_steps: int = 0,
                 log: bool = False, log_step: int = 0, log_dir: str = "./logs/test/"):
        self.cfg = cfg or Config()
        self.player = player
        self.inner = GymEnvWrapper(
            RampEnv("play", player, cfg=self.cfg, backend=backend, gui=gui)
        )
        self.env = _wrap(self.inner, max_steps)
        self.log = (log, log_step, log_dir + player)

    def run_episode(self, seed: int | None = None) -> dict:
        obs, info = self.env.reset(seed=seed)
        done = False
        while not done:
            obs, _, terminated, truncated, info = self.env.step(0)
            done = terminated or truncated
            self.inner.log_info_writer(info, done, *self.log)
        return info

    def run(self, max_episodes: int = 1) -> list[dict]:
        out = []
        for ep in range(max_episodes):
            info = self.run_episode()
            print(f"episode {ep + 1}: l={info.get('l', 0)}")
            out.append(info)
        self.env.close()
        return out

    def get_scenario_info(self) -> dict:
        return self.inner.get_env().get_scenario_info()

    def close(self) -> None:
        self.env.close()
