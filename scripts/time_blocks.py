"""Rigorous env-block timing for the fused sim cycle.

diag_block16 timed block=32 at an impossible-looking 0.4 ms/cycle while
check_block32 proved its outputs correct. Two timing hazards in the diag:
donated buffers chained across iterations, and blocking only on one leaf
of the final output. Here: NO donation, every iteration's full output
pytree is blocked on before the clock stops, and a per-iteration checksum
accumulates into the next iteration's action (true data dependency the
scheduler cannot elide).

Usage: python scripts/time_blocks.py [batch] [reps]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp


def main(batch: int = 256, reps: int = 20) -> None:
    from multimodal_drl_rmc_tpu.config import EnvConfig, ScenarioConfig
    from multimodal_drl_rmc_tpu.sim.env import DeviceRampEnv, make_batched_step

    print(f"backend={jax.default_backend()} batch={batch} reps={reps}")
    env = EnvConfig(scenario=ScenarioConfig(episode_seconds=400.0))
    denv = DeviceRampEnv(env, batch)

    for block in (8, 16, 32):
        try:
            step = jax.jit(make_batched_step(env, block=block))
            states, obs = denv.reset(jax.random.PRNGKey(0))
            actions = jnp.zeros((batch,), jnp.int32)
            t0 = time.perf_counter()
            states, out = step(states, actions)
            jax.block_until_ready(out)
            compile_s = time.perf_counter() - t0

            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                s, a = states, actions
                for _ in range(reps):
                    s, out = step(s, a)
                    # Checksum feeds the next action: a hard data dependency.
                    a = (a + out[1][0].astype(jnp.int32).sum() % 2) % 8
                jax.block_until_ready((s, out))
                best = min(best, (time.perf_counter() - t0) / reps)
            print(f"block={block}: {best * 1e3:8.2f} ms/cycle "
                  f"(compile {compile_s:.0f}s)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"block={block}: FAIL {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    a = [int(x) for x in sys.argv[1:3]]
    main(*a)
