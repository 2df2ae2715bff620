"""Device mesh helpers.

The reference has no cross-device story (its only parallelism is
SubprocVecEnv pipes, dqn/utils/baselines_wrappers/subproc_vec_env.py:39-112).
The TPU-native scale-out axes are:

  * ``dp``     — data-parallel learner shards (grads psum over ICI)
  * replay     — the HBM replay buffer shards along its capacity axis,
                 one shard per dp member (each shard holds a disjoint slice
                 of experience and samples locally — distributed PER)
  * actors     — host-side env fan-out feeds the sharded inserts

Collectives ride the mesh (psum/pmean); no NCCL/MPI analogue exists or is
needed.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    if len(devs) < n_devices:
        raise ValueError(f"requested {n_devices} devices, have {len(devs)}")
    return Mesh(np.asarray(devs[:n_devices]), (axis,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    return NamedSharding(mesh, P(axis))
