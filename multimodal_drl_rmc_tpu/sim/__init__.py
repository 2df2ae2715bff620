"""On-device batched traffic simulation (pure JAX)."""

from .env import DeviceRampEnv, EnvState, cycle_metrics, observation, reward
from .geometry import GEO, N_CHAINS, SLOTS, build_geometry
from .core import SimState, reset, step_1s

__all__ = [
    "DeviceRampEnv", "EnvState", "cycle_metrics", "observation", "reward",
    "GEO", "N_CHAINS", "SLOTS", "build_geometry",
    "SimState", "reset", "step_1s",
]
