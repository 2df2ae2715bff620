"""Diagnose the BT=16 Mosaic lowering failure + A/B kernel block sizes.

Round-2 note (CLAUDE.md): the fused sim kernel reached 75.7 ms/cycle at
env-block BT=8; doubling to 16 was known-broken and undiagnosed. This
runs each fused kernel at block 8/16/32 on the REAL chip, reporting
pass/fail with the root Mosaic error, and times a 40 s control cycle per
working block size so the fastest one can be made the default.

Usage: python scripts/diag_block16.py [batch]
"""

from __future__ import annotations

import sys
import time
import traceback

import jax
import jax.numpy as jnp


def main(batch: int = 256) -> None:
    from multimodal_drl_rmc_tpu.config import EnvConfig, ScenarioConfig
    from multimodal_drl_rmc_tpu.sim.env import DeviceRampEnv

    print(f"backend={jax.default_backend()} batch={batch}")
    env = EnvConfig(scenario=ScenarioConfig(episode_seconds=400.0))

    for block in (8, 16, 32):
        try:
            import multimodal_drl_rmc_tpu.sim.env as senv

            denv = DeviceRampEnv(env, batch)
            # Donate the env-state buffers: the training loop runs this
            # step donated (in-place HBM update); without donation every
            # call pays a full state copy (~135 vs ~76 ms/cycle at B=256).
            step = jax.jit(senv.make_batched_step(env, block=block),
                           donate_argnums=(0,))
            states, obs = denv.reset(jax.random.PRNGKey(0))
            actions = jnp.zeros((batch,), jnp.int32)
            t0 = time.perf_counter()
            states2, out = step(states, actions)
            jax.block_until_ready(out[1])
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            n = 5
            for _ in range(n):
                states2, out = step(states2, actions)
            jax.block_until_ready(out[1])
            ms = (time.perf_counter() - t0) / n * 1e3
            print(f"block={block}: OK  {ms:.1f} ms/cycle "
                  f"(compile {compile_s:.0f}s)")
        except Exception as e:  # noqa: BLE001 — we want the root error text
            tb = traceback.format_exc()
            tail = [l for l in tb.splitlines() if l.strip()][-12:]
            print(f"block={block}: FAIL — {type(e).__name__}")
            print("  " + "\n  ".join(tail))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 256)
