"""On-device sum tree for prioritized experience replay.

TPU-native redesign of the reference's pointer-chasing ``SumTree``
(dqn/utils/sum_tree.py:4-73). Instead of a Python while-loop per sample, the
tree is a dense heap-ordered array (node 1 = root, leaves at [C, 2C)) and all
operations are fixed-depth vectorized gathers/scatters:

  * ``update``  — O(depth) per batch: leaves are scattered, then each
    ancestor level is *recomputed from its children* (idempotent, so
    duplicate parent writes are safe — no scatter-add races).
  * ``sample``  — stratified descent for the whole batch at once: ``depth``
    rounds of a 2-way branch, each a vectorized gather.
  * max/min priority — the reference caches argmax/argmin indices and
    rescans on invalidation (sum_tree.py:15-32). Here two sibling trees with
    max-/min- reductions give exact O(depth) maintenance with no rescans.

All functions are jittable and differentiably irrelevant (int/index math).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


class SumTreeState(NamedTuple):
    sum_tree: jax.Array   # [2C] f32 — subtree priority sums
    max_tree: jax.Array   # [2C] f32 — subtree priority max (0 for empty)
    min_tree: jax.Array   # [2C] f32 — subtree priority min (+inf for empty)

    @property
    def capacity(self) -> int:
        return self.sum_tree.shape[0] // 2

    @property
    def total(self) -> jax.Array:
        return self.sum_tree[1]

    @property
    def max_priority(self) -> jax.Array:
        return self.max_tree[1]

    @property
    def min_priority(self) -> jax.Array:
        return self.min_tree[1]


def init(capacity: int) -> SumTreeState:
    c = _next_pow2(capacity)
    return SumTreeState(
        sum_tree=jnp.zeros(2 * c, jnp.float32),
        max_tree=jnp.zeros(2 * c, jnp.float32),
        min_tree=jnp.full(2 * c, jnp.inf, jnp.float32),
    )


def _depth(capacity: int) -> int:
    return capacity.bit_length() - 1  # capacity is a power of two


def update(state: SumTreeState, leaf_idx: jax.Array, priority: jax.Array) -> SumTreeState:
    """Set ``priority[i]`` at data slot ``leaf_idx[i]`` and repair ancestors.

    Duplicate indices follow last-wins semantics (matching sequential
    application in the reference's update loop, sum_tree.py:94-98).
    """
    c = state.capacity
    b = leaf_idx.shape[0]
    nodes = leaf_idx.astype(jnp.int32) + c

    if b > 1:
        # Keep only the last occurrence of each duplicated index.
        eq = nodes[None, :] == nodes[:, None]          # [B, B]
        later = jnp.triu(eq, k=1)                      # j > i with same idx
        is_last = ~jnp.any(later, axis=1)
        # Route duplicate-masked writes to a scratch mirror node (node 0 is
        # unused by the heap layout).
        write_nodes = jnp.where(is_last, nodes, 0)
    else:
        write_nodes = nodes

    sum_t = state.sum_tree.at[write_nodes].set(priority)
    max_t = state.max_tree.at[write_nodes].set(priority)
    min_t = state.min_tree.at[write_nodes].set(priority)

    parents = nodes // 2
    for _ in range(_depth(c)):
        left = 2 * parents
        right = left + 1
        sum_t = sum_t.at[parents].set(sum_t[left] + sum_t[right])
        max_t = max_t.at[parents].set(jnp.maximum(max_t[left], max_t[right]))
        min_t = min_t.at[parents].set(jnp.minimum(min_t[left], min_t[right]))
        parents = parents // 2

    return SumTreeState(sum_t, max_t, min_t)


def sample(
    state: SumTreeState, u: jax.Array, batch_size: int
) -> tuple[jax.Array, jax.Array]:
    """Stratified sampling: leaf indices + priorities for ``batch_size`` draws.

    ``u`` is uniform noise in [0, 1) of shape [batch_size]. Draw ``i`` targets
    the cumulative-priority point ``(i + u_i) * total / B`` — the reference's
    per-segment uniform draw (replay_memory.py:79-82).
    """
    c = state.capacity
    seg = state.total / batch_size
    offsets = jnp.arange(batch_size, dtype=jnp.float32)
    v = (offsets + u) * seg

    node = jnp.ones(batch_size, jnp.int32)
    for _ in range(_depth(c)):
        left = 2 * node
        lval = state.sum_tree[left]
        go_right = v > lval
        v = jnp.where(go_right, v - lval, v)
        node = left + go_right.astype(jnp.int32)

    leaf_idx = node - c
    priority = state.sum_tree[node]
    return leaf_idx, priority


def is_weights(
    state: SumTreeState, priority: jax.Array, size: jax.Array, beta: jax.Array
) -> jax.Array:
    """Normalized importance-sampling weights (replay_memory.py:76-86)."""
    total = jnp.maximum(state.total, 1e-12)
    prob = priority / total
    prob_min = state.min_priority / total
    sz = jnp.asarray(size, jnp.float32)
    max_w = jnp.power(jnp.maximum(sz * prob_min, 1e-12), -beta)
    w = jnp.power(jnp.maximum(sz * prob, 1e-12), -beta)
    return w / max_w
