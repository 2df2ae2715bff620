"""Correctness check for large env-block sizes of the fused sim kernel.

diag_block16 timed block=32 at an impossible 0.4 ms/cycle (40 sequential
kernel calls x 8 grid programs cannot finish in 0.4 ms), so before any
block-size decision, verify the kernel still computes the same physics:
run ONE 40 s control cycle from identical initial state at block 8 vs the
candidate block and compare every output (detector aggregates, queue,
trip stats, env state arrays).

Usage: python scripts/check_block32.py [batch] [block]
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np


def main(batch: int = 256, block: int = 32) -> None:
    from multimodal_drl_rmc_tpu.config import EnvConfig, ScenarioConfig
    from multimodal_drl_rmc_tpu.sim.env import DeviceRampEnv, make_batched_step

    print(f"backend={jax.default_backend()} batch={batch} block={block}")
    env = EnvConfig(scenario=ScenarioConfig(episode_seconds=400.0))
    denv = DeviceRampEnv(env, batch)
    states, obs = denv.reset(jax.random.PRNGKey(0))
    actions = jnp.zeros((batch,), jnp.int32)

    outs = {}
    for b in (8, block):
        step = jax.jit(make_batched_step(env, block=b))  # no donation: reuse states
        s2, out = step(states, actions)
        jax.block_until_ready(out[1])
        outs[b] = (s2, out)

    ok = True
    for name, a, c in [
        ("env_state", outs[8][0], outs[block][0]),
        ("step_out", outs[8][1], outs[block][1]),
    ]:
        la = jax.tree_util.tree_leaves(a)
        lc = jax.tree_util.tree_leaves(c)
        for i, (x, y) in enumerate(zip(la, lc)):
            x, y = np.asarray(x), np.asarray(y)
            if not np.allclose(x, y, rtol=1e-5, atol=1e-5):
                bad = np.max(np.abs(x.astype(np.float64) - y.astype(np.float64)))
                print(f"MISMATCH {name}[{i}] shape={x.shape} max|diff|={bad}")
                ok = False
    print("PASS: block sizes agree" if ok else "FAIL: block=%d diverges" % block)


if __name__ == "__main__":
    a = [int(x) for x in sys.argv[1:3]]
    main(*a)
