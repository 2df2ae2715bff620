"""Device-resident (HBM) replay buffers.

TPU-native redesign of the reference's host-side buffers
(dqn/replay_memory.py): instead of a Python deque of tuples
(``ReplayMemoryNaive``, :24-39) or an object-array sum tree
(``ReplayMemoryPrioritized``, :43-98), transitions live in preallocated HBM
arrays shaped [capacity, ...]. Insertion is a batched scatter, sampling a
batched gather — both inside ``jit`` so the learner never bounces to host.

Both buffers share ``ReplayData``; the prioritized buffer adds a
``SumTreeState`` (ops/sum_tree.py). The capacity axis is the natural sharding
axis for multi-chip learners (see parallel/).
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import sum_tree as st
from .losses import Batch


class ReplayData(NamedTuple):
    obs: jax.Array        # [N, D]
    action: jax.Array     # [N] int32
    reward: jax.Array     # [N] f32
    done: jax.Array       # [N] f32
    next_obs: jax.Array   # [N, D]
    ptr: jax.Array        # [] int32 — next write slot
    size: jax.Array       # [] int32 — current fill level


class PerReplayData(NamedTuple):
    data: ReplayData
    tree: st.SumTreeState


def init(capacity: int, obs_size: int, obs_dtype=jnp.float32) -> ReplayData:
    return ReplayData(
        obs=jnp.zeros((capacity, obs_size), obs_dtype),
        action=jnp.zeros((capacity,), jnp.int32),
        reward=jnp.zeros((capacity,), jnp.float32),
        done=jnp.zeros((capacity,), jnp.float32),
        next_obs=jnp.zeros((capacity, obs_size), obs_dtype),
        ptr=jnp.zeros((), jnp.int32),
        size=jnp.zeros((), jnp.int32),
    )


def init_per(
    capacity: int, obs_size: int, obs_dtype=jnp.float32, tree_kind: str | None = None
) -> PerReplayData:
    """Prioritized buffer. ``tree_kind``: "chunked" (default — the two-level
    TPU-shaped tree, ops/sum_tree.py module docstring) or "heap" (the
    log-depth heap tree). Overridable via ``MDRLRMC_PER_TREE``."""
    kind = tree_kind or os.environ.get("MDRLRMC_PER_TREE", "chunked")
    if kind not in ("chunked", "heap"):
        raise ValueError(f"unknown PER tree kind: {kind!r}")
    tree = st.init_chunked(capacity) if kind == "chunked" else st.init(capacity)
    return PerReplayData(init(capacity, obs_size, obs_dtype), tree)


def _capacity(data: ReplayData) -> int:
    return data.obs.shape[0]


def insert(data: ReplayData, batch: Batch) -> ReplayData:
    """Append a batch of ``n_env`` transitions at the ring pointer."""
    n = batch.obs.shape[0]
    cap = _capacity(data)
    idx = (data.ptr + jnp.arange(n, dtype=jnp.int32)) % cap
    return ReplayData(
        obs=data.obs.at[idx].set(batch.obs.astype(data.obs.dtype)),
        action=data.action.at[idx].set(batch.action.astype(jnp.int32)),
        reward=data.reward.at[idx].set(batch.reward),
        done=data.done.at[idx].set(batch.done),
        next_obs=data.next_obs.at[idx].set(batch.next_obs.astype(data.obs.dtype)),
        ptr=(data.ptr + n) % cap,
        size=jnp.minimum(data.size + n, cap),
    )


def gather(data: ReplayData, idx: jax.Array) -> Batch:
    return Batch(
        obs=data.obs[idx].astype(jnp.float32),
        action=data.action[idx],
        reward=data.reward[idx],
        done=data.done[idx],
        next_obs=data.next_obs[idx].astype(jnp.float32),
    )


def sample_uniform(data: ReplayData, rng: jax.Array, batch_size: int) -> Batch:
    """Uniform sampling with replacement over the filled region.

    (The reference's ``random.sample`` draws without replacement,
    replay_memory.py:38-39; with capacity >> batch this is statistically
    indistinguishable and with-replacement keeps the op a single gather.)
    """
    idx = jax.random.randint(rng, (batch_size,), 0, jnp.maximum(data.size, 1))
    return gather(data, idx)


# ---------------------------------------------------------------------------
# Prioritized buffer (reference ReplayMemoryPrioritized, replay_memory.py:43-98)
# ---------------------------------------------------------------------------


def per_insert(buf: PerReplayData, batch: Batch, max_priority_high: float = 1.0) -> PerReplayData:
    """Insert with the current max priority (1.0 when empty)."""
    n = batch.obs.shape[0]
    cap = _capacity(buf.data)
    idx = (buf.data.ptr + jnp.arange(n, dtype=jnp.int32)) % cap
    max_p = buf.tree.max_priority
    max_p = jnp.where(max_p <= 0.0, max_priority_high, max_p)
    # Ring slots ptr..ptr+n-1 are distinct whenever n <= capacity, so the
    # O(n^2) duplicate resolution inside update is skippable.
    tree = st.update(buf.tree, idx, jnp.full((n,), max_p, jnp.float32),
                     assume_unique=True)
    return PerReplayData(insert(buf.data, batch), tree)


class PerSample(NamedTuple):
    batch: Batch
    leaf_idx: jax.Array    # [B] data-slot indices for priority updates
    is_weights: jax.Array  # [B] normalized importance weights


def per_sample(
    buf: PerReplayData, rng: jax.Array, batch_size: int, beta: jax.Array
) -> PerSample:
    u = jax.random.uniform(rng, (batch_size,))
    leaf_idx, priority = st.sample(buf.tree, u, batch_size)
    w = st.is_weights(buf.tree, priority, buf.data.size, beta)
    return PerSample(gather(buf.data, leaf_idx), leaf_idx, w)


def per_update_priorities(
    buf: PerReplayData,
    leaf_idx: jax.Array,
    abs_td: jax.Array,
    *,
    epsilon: float = 1e-4,
    alpha: float = 0.6,
    max_priority: float = 1.0,
) -> PerReplayData:
    """p = min(|td| + eps, p_max) ** alpha (reference replay_memory.py:94-98)."""
    p = jnp.power(jnp.minimum(abs_td + epsilon, max_priority), alpha)
    return PerReplayData(buf.data, st.update(buf.tree, leaf_idx, p))
