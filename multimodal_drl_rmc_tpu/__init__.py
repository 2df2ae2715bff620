"""TPU-native multimodal deep-RL ramp-metering framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
youcefMehamlia/Multimodal-DRL-RMC (DQN-family agents controlling a highway
on-ramp meter from a hybrid macroscopic-detector + connected-vehicle-grid
state), redesigned TPU-first:

  * device-resident learner: pure jitted train steps over explicit state
  * HBM replay ring buffer + on-device sum-tree PER (Pallas-accelerated)
  * host async actor pool around pluggable traffic backends (native C++
    microsim, SUMO/TraCI when available, scripted fake for tests)
  * fully on-device batched traffic simulator for throughput training
  * multi-chip scaling via jax.sharding Mesh (DP learner, sharded replay)
"""

from .config import Config, EnvConfig, GridConfig, HyperParams, NetworkSpec, ScenarioConfig

__version__ = "0.1.0"

__all__ = [
    "Config",
    "EnvConfig",
    "GridConfig",
    "HyperParams",
    "NetworkSpec",
    "ScenarioConfig",
]
