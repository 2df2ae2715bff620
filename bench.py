"""Headline benchmark: replay transitions/sec/chip of the DQN learner.

Measures the jitted TPU train step (sample from 1M-transition HBM replay +
double-dueling-DQN forward/backward on the two-stream hybrid network + Adam +
Polyak target update) against the PyTorch-CPU equivalent of the reference's
learner (dqn/agent.py:204-226 semantics, same architecture/hyper-params),
which is how the reference actually runs its learner when no CUDA GPU is
present (agent.py:51 falls back to CPU).

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "transitions/sec/chip", "vs_baseline": N}
"""

from __future__ import annotations

import json
import sys
import time

BATCH = 32          # reference batch size (env/dqn_config.py:36)
CAPACITY = 1_000_000  # reference max_mem (env/dqn_config.py:39)
OBS = 14 + 2 * 27 * 5
STEPS = 4096
TORCH_STEPS = 500  # ~15 s on one CPU core; enough to quench sample variance


def bench_tpu() -> float:
    import jax
    import jax.numpy as jnp

    from multimodal_drl_rmc_tpu.config import Config, HyperParams
    from multimodal_drl_rmc_tpu.agents.dqn import make_learner
    from multimodal_drl_rmc_tpu.ops.losses import Batch

    cfg = Config(hp=HyperParams(algo="DuelingDoubleDQNAgent", batch_size=BATCH,
                                max_mem=CAPACITY))
    learner = make_learner(cfg)
    rng = jax.random.PRNGKey(0)
    state = learner.init_state(rng)
    buffer = learner.init_buffer()

    # Fill a slice of the buffer with synthetic transitions.
    n = 4096
    obs = jax.random.uniform(jax.random.fold_in(rng, 1), (n, OBS))
    batch = Batch(
        obs=obs,
        action=jax.random.randint(jax.random.fold_in(rng, 2), (n,), 0, 8),
        reward=jax.random.uniform(jax.random.fold_in(rng, 3), (n,)),
        done=jnp.zeros((n,), jnp.float32),
        next_obs=obs,
    )
    for _ in range(4):
        buffer = learner.insert(buffer, batch)

    # Compile + warm up (donation consumes state/buffer; keep the outputs).
    state, buffer, m = learner.train_many(state, buffer, jax.random.fold_in(rng, 4), STEPS)
    float(m.loss)  # materialize: wait for compile + run
    jax.block_until_ready((state, buffer))

    # Best of 3 windows, symmetric with the torch baseline's best-of-5:
    # a busy host core or a slow tunnel round-trip deflates single-window
    # numbers (r02 352.0k vs a 317k single window measured under load).
    best = 0.0
    for i in range(3):
        t0 = time.perf_counter()
        state, buffer, m = learner.train_many(
            state, buffer, jax.random.fold_in(rng, 5 + i), STEPS)
        float(m.loss)
        jax.block_until_ready(state.params)
        best = max(best, STEPS * BATCH / (time.perf_counter() - t0))
    return best


def bench_torch_cpu_reference() -> float:
    """Reference-equivalent learner step on torch CPU (double dueling DQN,
    bs=32, Adam, SmoothL1, soft target update)."""
    import numpy as np
    import torch

    from multimodal_drl_rmc_tpu.config import NetworkSpec
    from multimodal_drl_rmc_tpu.models.packio import build_torch_twin

    torch.set_num_threads(max(torch.get_num_threads(), 1))
    online = build_torch_twin(NetworkSpec(), 8)
    target = build_torch_twin(NetworkSpec(), 8)
    target.load_state_dict(online.state_dict())
    opt = torch.optim.Adam(online.parameters(), lr=1e-4)
    loss_fn = torch.nn.SmoothL1Loss()

    rng = np.random.default_rng(0)
    pool = rng.uniform(size=(4096, OBS)).astype(np.float32)
    actions_pool = rng.integers(0, 8, size=4096)
    rewards_pool = rng.uniform(size=4096).astype(np.float32)

    def step():
        idx = rng.integers(0, 4096, size=BATCH)
        obs = torch.from_numpy(pool[idx])
        act = torch.from_numpy(actions_pool[idx]).long().unsqueeze(-1)
        rew = torch.from_numpy(rewards_pool[idx]).unsqueeze(-1)
        nobs = obs
        with torch.no_grad():
            best = online(nobs).argmax(dim=1, keepdim=True)
            tsel = target(nobs).gather(1, best)
            targets = rew + 0.99 * tsel
        q = online(obs).gather(1, act)
        loss = loss_fn(q, targets)
        opt.zero_grad()
        loss.backward()
        opt.step()
        with torch.no_grad():
            tau = 1e-3
            for tp, op in zip(target.parameters(), online.parameters()):
                tp.data.copy_(tau * op.data + (1 - tau) * tp.data)

    for _ in range(5):
        step()
    # The single shared CPU core is sometimes busy (background jobs),
    # which would deflate the baseline and INFLATE vs_baseline run-to-run
    # (r01 measured 230x, r02 314x from the same ~350k TPU numerator).
    # Measure in chunks and keep the FASTEST window — the best estimate of
    # the uncontended reference throughput, i.e. the conservative ratio.
    best = 0.0
    chunk = TORCH_STEPS // 5
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(chunk):
            step()
        best = max(best, chunk * BATCH / (time.perf_counter() - t0))
    return best


def main():
    import os

    tpu = bench_tpu()
    try:
        base = bench_torch_cpu_reference()
    except Exception:
        base = float("nan")
    # The torch-CPU denominator re-measured on the contended single core
    # swung the reported ratio 251-315x across rounds while the TPU
    # numerator was stable (352.0k -> 363.2k). The committed
    # BASELINE_TORCH.json pins a one-time controlled measurement so
    # vs_baseline is comparable round-over-round BY CONSTRUCTION; the live
    # re-measurement still ships alongside as a sanity channel.
    pinned = None
    pinned_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BASELINE_TORCH.json")
    if os.path.isfile(pinned_path):
        with open(pinned_path) as f:
            pinned = json.load(f).get("transitions_per_sec")
    live = round(tpu / base, 2) if base == base else None
    print(json.dumps({
        "metric": "learner replay transitions/sec/chip (hybrid dueling double DQN, bs=32, 1M HBM replay)",
        "value": round(tpu, 1),
        "unit": "transitions/sec/chip",
        "vs_baseline": round(tpu / pinned, 2) if pinned else live,
        "vs_baseline_live": live,
        "baseline_pinned": pinned,
    }))


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()
