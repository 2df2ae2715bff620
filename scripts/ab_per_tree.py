"""A/B the PER priority-tree structures inside the fused device trainer.

The PER flagship trains at ~1,100 env-steps/s vs ~2,600 uniform
(BENCHMARKS.md) — the gap is the prioritized machinery. The heap tree
(ops/sum_tree.py SumTreeState) costs ~60 dependent tiny gather HLOs per
sample and ~180 per update at 1M capacity (depth 20 × 3 trees); the
chunked two-level tree (ChunkedTreeState) does the same math in ~8 dense
VPU-shaped ops. This times the COMPLETE fused training superstep
(act + 40 s sim + insert + B learner updates at ratio 1) for both tree
kinds on the real chip and prints env-steps/s for BENCHMARKS.md.

Usage: python scripts/ab_per_tree.py [batch] [--quick]
(--quick = tiny CPU smoke of both paths)
"""

from __future__ import annotations

import os
import sys
import time

import jax


def run(kind: str, batch: int, quick: bool) -> float:
    os.environ["MDRLRMC_PER_TREE"] = kind
    import dataclasses

    from multimodal_drl_rmc_tpu.config import Config
    from multimodal_drl_rmc_tpu.sim.train_on_device import DeviceTrainer

    cfg = Config()
    cfg = cfg.replace(hp=dataclasses.replace(
        cfg.hp, algo="PerDuelingDoubleDQNAgent", n_step=3, load=False,
        max_mem=2048 if quick else cfg.hp.max_mem))
    trainer = DeviceTrainer(cfg, batch=batch, seed=0, replay_ratio=1.0)
    carry = trainer.init_carry()
    assert type(carry.buffer.tree).__name__ == (
        "ChunkedTreeState" if kind == "chunked" else "SumTreeState")

    # Warm the buffer past min_mem behavior boundaries + compile both graphs.
    warm_iters = 2 if quick else 48
    for _ in range(warm_iters // 8 + 1):
        carry = trainer._warm_chunk(carry, 8, False)
    t0 = time.perf_counter()
    carry, _ = trainer._train_chunk(carry)
    jax.block_until_ready(carry.rew_mean)
    compile_s = time.perf_counter() - t0

    reps = 1 if quick else 5
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            carry, _ = trainer._train_chunk(carry)
        jax.block_until_ready(carry.rew_mean)
        best = min(best, (time.perf_counter() - t0) / reps)
    steps_per_s = trainer.CHUNK * batch / best
    print(f"{kind:>8}: {best * 1e3 / trainer.CHUNK:8.1f} ms/superstep  "
          f"{steps_per_s:10.0f} env-steps/s  (compile {compile_s:.0f}s)",
          flush=True)
    return steps_per_s


def main() -> None:
    quick = "--quick" in sys.argv
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    batch = int(args[0]) if args else (8 if quick else 256)
    print(f"backend={jax.default_backend()} batch={batch} ratio=1 n_step=3")
    r = {k: run(k, batch, quick) for k in ("heap", "chunked")}
    print(f"chunked/heap speedup: {r['chunked'] / r['heap']:.2f}x")


if __name__ == "__main__":
    main()
