"""Weak-scaling characterization of the multi-chip fused trainer.

Real multi-chip hardware is not available in this image, so this runs the
full DistributedDeviceTrainer program (shard_mapped sim + DP learner +
gradient pmean, sim/distributed.py) on an N-virtual-device CPU mesh. All
virtual devices share one physical core, so absolute throughput cannot
scale; what this measures is the *orchestration overhead model*: under
weak scaling (fixed envs/device) the wall-clock per superstep should grow
~linearly with ndev on one core — any superlinear growth would expose
shard_map/collective overhead that would also tax real ICI.

Usage: python scripts/bench_multichip.py  (forces the CPU platform itself)
"""

import os
import time

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from multimodal_drl_rmc_tpu.config import (  # noqa: E402
    Config, EnvConfig, HyperParams, ScenarioConfig,
)
from multimodal_drl_rmc_tpu.parallel.mesh import make_mesh  # noqa: E402
from multimodal_drl_rmc_tpu.sim.distributed import (  # noqa: E402
    DistributedDeviceTrainer,
)


def bench(ndev: int, envs_per_device: int = 2, chunks: int = 2):
    DistributedDeviceTrainer.CHUNK = 4  # keep the 1-core sweep bounded
    cfg = Config(
        env=EnvConfig(scenario=ScenarioConfig(episode_seconds=400.0)),
        hp=HyperParams(batch_size=32, min_mem=64, max_mem=4096,
                       load=False, max_total_steps=0),
    )
    mesh = make_mesh(ndev)
    tr = DistributedDeviceTrainer(cfg, mesh, envs_per_device,
                                  replay_ratio=1.0)
    carry = tr.init_carry()
    carry, out = tr._warm_chunk(carry)
    carry, out = tr._train_chunk(carry)          # compile + first run
    jax.block_until_ready(out["loss"])
    t0 = time.time()
    for _ in range(chunks):
        carry, out = tr._train_chunk(carry)
    jax.block_until_ready(out["loss"])
    dt = time.time() - t0
    supersteps = chunks * tr.CHUNK
    env_steps = supersteps * tr.batch
    return dt / supersteps, env_steps / dt


def main():
    base = None
    print(f"{'ndev':>4} {'B':>4} {'ms/superstep':>13} {'env-steps/s':>12} "
          f"{'overhead vs linear':>18}")
    for ndev in (1, 4, 8):
        ms, sps = bench(ndev)
        if base is None:
            base = ms
        # Perfect 1-core weak scaling: ms grows linearly with ndev.
        overhead = ms / (base * ndev) - 1.0
        print(f"{ndev:>4} {ndev * 2:>4} {ms * 1e3:>13.1f} {sps:>12.1f} "
              f"{overhead * 100:>17.1f}%", flush=True)


if __name__ == "__main__":
    main()
