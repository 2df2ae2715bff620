"""Break down the prioritized-replay superstep residual (round-4 VERDICT #5).

Measured at B=256 envs, replay-ratio 1: 2,600 env-steps/s uniform vs
2,163 PER — ~20 ms per 256-update superstep, ~78 us of PER overhead per
learner update. This times the PER primitives in ISOLATION on a
production-shape buffer (capacity 1M, obs 284 f32, train batch 32), each
wrapped in a k=256 ``lax.scan`` exactly like ``train_many``, so the
per-iteration dispatch structure matches training:

  uniform    randint + 5-array gather            (the uniform baseline)
  sample     stratified chunked sample + gather + IS weights
  update     priority scatter + chunk recompute  (per_update_priorities)
  samp+upd   both — the full per-train-step PER overhead
  insert     per_insert vs plain insert, one 256-slot batch per superstep

Timing hygiene per scripts/time_blocks.py: no donation, block on the full
output, a checksum feeds the next iteration (hard data dependency).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_per.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from multimodal_drl_rmc_tpu.ops import replay, sum_tree as st
from multimodal_drl_rmc_tpu.ops.losses import Batch

CAP = 1_000_000
OBS = 284
BS = 32          # hp.batch_size
K = 256          # learner updates per superstep at B=256 envs, ratio 1
NENV = 256


def timeit(fn, *args, reps: int = 10) -> float:
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def filled_buffer(rng) -> replay.PerReplayData:
    buf = replay.init_per(CAP, OBS)
    r1, r2 = jax.random.split(rng)
    prios = jax.random.uniform(r1, (st._next_pow2(CAP),), minval=0.01,
                               maxval=1.0)
    rows = prios.reshape(-1, st._chunk_size(st._next_pow2(CAP)))
    tree = st.ChunkedTreeState(
        priority=prios, chunk_sum=rows.sum(1), chunk_max=rows.max(1),
        chunk_min=jnp.min(jnp.where(rows > 0, rows, jnp.inf), 1))
    data = buf.data._replace(
        obs=jax.random.normal(r2, (CAP, OBS), jnp.float32),
        next_obs=jax.random.normal(r2, (CAP, OBS), jnp.float32),
        ptr=jnp.zeros((), jnp.int32), size=jnp.asarray(CAP, jnp.int32))
    return replay.PerReplayData(data, tree)


def main() -> None:
    print(f"backend={jax.default_backend()} cap={CAP} bs={BS} k={K}")
    rng = jax.random.PRNGKey(0)
    buf = filled_buffer(rng)
    beta = jnp.asarray(0.5, jnp.float32)

    def scan_k(body):
        @jax.jit
        def run(buf, rng):
            def step(carry, _):
                b, r, chk = carry
                r, sub = jax.random.split(r)
                b, chk = body(b, sub, chk)
                return (b, r, chk), None
            (b, r, chk), _ = jax.lax.scan(
                step, (buf, rng, jnp.zeros((), jnp.float32)), None, length=K)
            return chk
        return run

    def v_uniform(b, r, chk):
        batch = replay.sample_uniform(b.data, r, BS)
        return b, chk + batch.reward.sum() + batch.obs[0, 0]

    def v_sample(b, r, chk):
        s = replay.per_sample(b, r, BS, beta)
        return b, chk + s.is_weights.sum() + s.batch.obs[0, 0]

    def v_update(b, r, chk):
        idx = jax.random.randint(r, (BS,), 0, CAP)
        td = jax.random.uniform(r, (BS,)) + chk * 0.0
        return replay.per_update_priorities(b, idx, td), chk + td.sum()

    def v_both(b, r, chk):
        s = replay.per_sample(b, r, BS, beta)
        td = jnp.abs(s.batch.reward) + s.is_weights
        b = replay.per_update_priorities(b, s.leaf_idx, td)
        return b, chk + s.is_weights.sum()

    for name, body in [("uniform", v_uniform), ("sample", v_sample),
                       ("update", v_update), ("samp+upd", v_both)]:
        t = timeit(scan_k(body), buf, rng)
        print(f"{name:9s} k={K}: {t * 1e3:7.2f} ms/superstep "
              f"({t / K * 1e6:6.1f} us/step)", flush=True)

    # Insert: one B=256 batch per superstep (outside the learner scan).
    batch = Batch(obs=jnp.zeros((NENV, OBS)), action=jnp.zeros((NENV,), jnp.int32),
                  reward=jnp.zeros((NENV,)), done=jnp.zeros((NENV,)),
                  next_obs=jnp.zeros((NENV, OBS)))
    t_plain = timeit(jax.jit(lambda b, x: replay.insert(b, x)), buf.data, batch)
    t_per = timeit(jax.jit(lambda b, x: replay.per_insert(b, x)), buf, batch)
    print(f"insert    plain {t_plain * 1e3:6.2f} ms   per {t_per * 1e3:6.2f} ms"
          f"   (delta {(t_per - t_plain) * 1e3:.2f} ms/superstep)", flush=True)


if __name__ == "__main__":
    main()
