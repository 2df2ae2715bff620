"""Micro-breakdown of _chunked_sample (follow-up to profile_per.py).

Times each stage of the stratified sample as its own k=256 scan so the
dispatch structure matches train_many. Stages accumulate: each variant
runs the pipeline up to and including the named stage (differences are
the marginal cost of the stage).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_per_sample.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from multimodal_drl_rmc_tpu.ops import replay, sum_tree as st
from scripts.profile_per import BS, CAP, K, filled_buffer, timeit


def main() -> None:
    print(f"backend={jax.default_backend()} cap={CAP} bs={BS} k={K}")
    rng = jax.random.PRNGKey(0)
    buf = filled_buffer(rng)
    tree = buf.tree
    c = tree.capacity
    k = st._chunk_size(c)
    m = c // k

    def scan_k(body):
        @jax.jit
        def run(rng):
            def step(carry, _):
                r, chk = carry
                r, sub = jax.random.split(r)
                chk = chk + body(sub, chk)
                return (r, chk), None
            return jax.lax.scan(step, (rng, jnp.zeros(())), None, length=K)[0][1]
        return run

    def upto(stage):
        def body(r, chk):
            u = jax.random.uniform(r, (BS,))
            cums = jnp.cumsum(tree.chunk_sum)
            total = cums[-1]
            seg = total / BS
            v = jnp.minimum((jnp.arange(BS, dtype=jnp.float32) + u) * seg, total)
            if stage == "cumsum_m":
                return cums[-1] + v.sum()
            chunk = jnp.sum((cums[None, :] < v[:, None]).astype(jnp.int32), axis=1)
            chunk = jnp.minimum(chunk, m - 1)
            base = jnp.where(chunk > 0, cums[jnp.maximum(chunk - 1, 0)], 0.0)
            v_in = v - base
            if stage == "chunk_sel":
                return v_in.sum() + chunk.sum()
            rows = tree.priority.reshape(m, k)[chunk]
            if stage == "row_gather":
                return rows[0, 0] + v_in.sum()
            rcum = jnp.cumsum(rows, axis=1)
            if stage == "row_cumsum":
                return rcum[0, -1] + v_in.sum()
            v_in = jnp.minimum(v_in, rcum[:, -1])
            off = jnp.sum((rcum < v_in[:, None]).astype(jnp.int32), axis=1)
            off = jnp.minimum(off, k - 1)
            leaf_idx = chunk * k + off
            priority = jnp.take_along_axis(rows, off[:, None], axis=1)[:, 0]
            if stage == "leaf_sel":
                return priority.sum() + leaf_idx.sum()
            w = st.is_weights(tree, priority, jnp.asarray(CAP), jnp.asarray(0.5))
            if stage == "is_w":
                return w.sum()
            batch = replay.gather(buf.data, leaf_idx)
            return w.sum() + batch.obs[0, 0] + batch.reward.sum()
        return body

    prev = 0.0
    for stage in ["cumsum_m", "chunk_sel", "row_gather", "row_cumsum",
                  "leaf_sel", "is_w", "full"]:
        t = timeit(scan_k(upto(stage)), rng)
        print(f"{stage:10s}: {t * 1e3:7.2f} ms/superstep "
              f"({t / K * 1e6:6.1f} us/step)  marginal "
              f"{(t - prev) / K * 1e6:+6.1f} us", flush=True)
        prev = t


if __name__ == "__main__":
    main()
