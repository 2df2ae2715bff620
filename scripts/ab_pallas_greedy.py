"""A/B the fused Pallas dueling-greedy kernel vs plain XLA argmax.

VERDICT r2 item 4: the kernel (ops/pallas/dueling.py — fused advantage
matmul + masked argmax, the reference's DuelingDeepQNetwork.actions
semantics, network.py:110-117) is wired into greedy_fn behind
use_pallas_greedy(); this times BOTH paths on the flagship hybrid
network at several batch sizes on the real chip and prints a table for
BENCHMARKS.md.

Usage: python scripts/ab_pallas_greedy.py [--quick]  (TPU env; --quick =
tiny CPU smoke run of both paths)
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp


def bench(fn, params, obs, n=200) -> float:
    """Median-of-3 timing of n jitted calls, microseconds per call."""
    jfn = jax.jit(fn)
    jax.block_until_ready(jfn(params, obs))  # compile
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            out = jfn(params, obs)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / n * 1e6)
    return best


def main() -> None:
    from multimodal_drl_rmc_tpu.config import Config, network_spec_for_variant
    from multimodal_drl_rmc_tpu.models import networks

    print(f"backend={jax.default_backend()}")
    cfg = Config()
    spec = network_spec_for_variant(cfg.env.obs_variant)
    net = networks.build_network(spec, cfg.env.n_actions)
    rng = jax.random.PRNGKey(0)
    obs_dim = cfg.env.obs_size
    params = networks.init_params(net, obs_dim, rng)

    quick = "--quick" in sys.argv
    batches = (64,) if quick else (256, 1024, 4096, 16384)
    n = 3 if quick else 200
    print(f"{'B':>6} {'pallas us':>10} {'xla us':>10} {'speedup':>8}")
    for b in batches:
        obs = jax.random.uniform(rng, (b, obs_dim), jnp.float32)
        times = {}
        for use_pallas in (True, False):
            networks._PALLAS_GREEDY_CHOICE["v"] = use_pallas
            fn = networks.greedy_fn(net)
            times[use_pallas] = bench(fn, params, obs, n=n)
        print(f"{b:>6} {times[True]:>10.1f} {times[False]:>10.1f} "
              f"{times[False] / times[True]:>7.2f}x")


if __name__ == "__main__":
    main()
