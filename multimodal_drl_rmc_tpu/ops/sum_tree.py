"""On-device priority trees for prioritized experience replay.

TPU-native redesigns of the reference's pointer-chasing ``SumTree``
(dqn/utils/sum_tree.py:4-73). Two interchangeable structures behind one
functional API (``update`` / ``sample`` / ``is_weights`` dispatch on the
state type):

**Heap tree** (``SumTreeState``, ``init``) — a dense heap-ordered array
(node 1 = root, leaves at [C, 2C)); every operation is a fixed-depth
(log2 C ≈ 20 at 1M capacity) sequence of vectorized gathers/scatters:

  * ``update``  — O(depth) per batch: leaves are scattered, then each
    ancestor level is *recomputed from its children* (idempotent, so
    duplicate parent writes are safe — no scatter-add races).
  * ``sample``  — stratified descent for the whole batch at once: ``depth``
    rounds of a 2-way branch, each a vectorized gather.
  * max/min priority — the reference caches argmax/argmin indices and
    rescans on invalidation (sum_tree.py:15-32). Here two sibling trees with
    max-/min- reductions give exact O(depth) maintenance with no rescans.

**Chunked (two-level) tree** (``ChunkedTreeState``, ``init_chunked``) — the
TPU-shaped structure and the default for training (``ops/replay.py``): the
heap's 20 dependent levels cost ~60 tiny gather HLOs per sample and ~180
per update, and on TPU these dispatch-bound micro-ops dominate PER cost
(the sim is dispatch-bound for the same reason, CLAUDE.md). Instead keep a
flat [C] leaf-priority array plus per-chunk sum/max/min over √C-sized
chunks; a stratified sample is then two *dense* cumsum+compare passes
([M] chunks, then one [B, K] row block), and an update is one leaf scatter
plus an exact recompute of the touched chunks' reductions — ~8 large
VPU-friendly ops each, no level-by-level dependency chain. Invariant:
written priorities are strictly positive (the reference guarantees
p = (|td|+eps)^alpha >= eps^alpha, replay_memory.py:94-98), so priority 0
marks an empty slot and chunk min/max can be recomputed from leaves alone.

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


def _heap_update(state: SumTreeState, leaf_idx: jax.Array, priority: jax.Array,
                 assume_unique: bool = False) -> SumTreeState:
    """Set ``priority[i]`` at data slot ``leaf_idx[i]`` and repair ancestors.

    Duplicate indices follow last-wins semantics (matching sequential
    application in the reference's update loop, sum_tree.py:94-98).
    ``assume_unique`` skips the O(B^2) duplicate resolution for callers
    with guaranteed-distinct indices (ring-buffer inserts).
    """
    c = state.capacity
    b = leaf_idx.shape[0]
    nodes = leaf_idx.astype(jnp.int32) + c

    if b > 1 and not assume_unique:
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


def _heap_sample(
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
    state, priority: jax.Array, size: jax.Array, beta: jax.Array
) -> jax.Array:
    """Normalized importance-sampling weights (replay_memory.py:76-86).

    Works for both tree structures — only the ``total`` / ``min_priority``
    properties are consulted.
    """
    total = jnp.maximum(state.total, 1e-12)
    prob = priority / total
    prob_min = state.min_priority / total
    sz = jnp.asarray(size, jnp.float32)
    max_w = jnp.power(jnp.maximum(sz * prob_min, 1e-12), -beta)
    w = jnp.power(jnp.maximum(sz * prob, 1e-12), -beta)
    return w / max_w


# ---------------------------------------------------------------------------
# Chunked (two-level) tree — the TPU-shaped default (module docstring).
# ---------------------------------------------------------------------------


def _chunk_size(capacity: int) -> int:
    """K = min(1024, C): √C-balanced at the production 1M capacity
    (M = C/K chunks of K leaves — both 1024 at C = 2^20)."""
    return min(1024, capacity)


# Upper-triangular ones (inclusive prefix-sum operators), cached per K.
_TRIU: dict[int, "object"] = {}  # numpy [K,K] upper-triangular ones


def _row_prefix_sum(rows: jax.Array) -> jax.Array:
    """Inclusive prefix sum over the minor axis via the MXU.

    ``jnp.cumsum`` over a [B, K] lane axis is the PER sampler's hot spot
    on TPU (~46 of the ~78 us/step prioritized-superstep residual,
    scripts/profile_per_sample.py); ``rows @ triu_ones`` does the same
    reduction as one [B,K]x[K,K] matmul in ~13.5 us
    (scripts/profile_cumsum_variants.py). f32 HIGHEST precision keeps
    integer-valued priorities bit-exact (tests/test_chunked_tree.py heap
    parity) and real priorities within an f32 ulp — and the sampler's
    correctness never depends on the prefix values themselves, only on
    internal consistency: the in-chunk target is clamped to THIS array's
    last entry, and zero (empty-slot) tail entries contribute exactly 0
    in every precision mode, so the clamp still lands on a written leaf
    (cf. test_partial_fill_never_samples_empty_slots).
    """
    k = rows.shape[-1]
    tri = _TRIU.get(k)
    if tri is None:
        # numpy, not jnp: a jnp constant built during a trace would be a
        # tracer, and caching it across traces leaks it.
        import numpy as np

        tri = _TRIU[k] = np.triu(np.ones((k, k), np.float32))
    return jax.lax.dot_general(
        rows, tri, (((rows.ndim - 1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)


class ChunkedTreeState(NamedTuple):
    priority: jax.Array    # [C]  f32 leaf priorities (0 = empty slot)
    chunk_sum: jax.Array   # [M]  f32 per-chunk priority sums
    chunk_max: jax.Array   # [M]  f32 per-chunk max (0 for empty)
    chunk_min: jax.Array   # [M]  f32 per-chunk min over written slots (+inf)

    @property
    def capacity(self) -> int:
        return self.priority.shape[0]

    @property
    def total(self) -> jax.Array:
        return jnp.sum(self.chunk_sum)

    @property
    def max_priority(self) -> jax.Array:
        return jnp.max(self.chunk_max)

    @property
    def min_priority(self) -> jax.Array:
        return jnp.min(self.chunk_min)


def init_chunked(capacity: int) -> ChunkedTreeState:
    c = _next_pow2(capacity)
    m = c // _chunk_size(c)
    return ChunkedTreeState(
        priority=jnp.zeros(c, jnp.float32),
        chunk_sum=jnp.zeros(m, jnp.float32),
        chunk_max=jnp.zeros(m, jnp.float32),
        chunk_min=jnp.full(m, jnp.inf, jnp.float32),
    )


def _chunked_update(
    state: ChunkedTreeState, leaf_idx: jax.Array, priority: jax.Array,
    assume_unique: bool = False,
) -> ChunkedTreeState:
    """Scatter leaves, then recompute the touched chunks' reductions exactly.

    Duplicate indices: every duplicate writes the LAST occurrence's value
    (computed up front), so the scatter is deterministic and last-wins —
    matching sequential application in the reference (sum_tree.py:94-98).
    Chunk recomputes read the post-scatter leaves, so duplicate chunk
    writes all carry the same value (idempotent, race-free).
    ``assume_unique`` skips the O(B^2) duplicate resolution for callers
    with guaranteed-distinct indices (ring-buffer inserts).
    """
    c = state.capacity
    k = _chunk_size(c)
    m = c // k
    b = leaf_idx.shape[0]
    idx = leaf_idx.astype(jnp.int32)

    if b > 1 and not assume_unique:
        eq = idx[None, :] == idx[:, None]                     # [B, B]
        occ = jnp.where(eq, jnp.arange(b, dtype=jnp.int32)[None, :], -1)
        priority = priority[jnp.max(occ, axis=1)]             # last-wins value

    leaves = state.priority.at[idx].set(priority)
    chunks = idx // k                                         # [B] (dups ok)
    rows = leaves.reshape(m, k)[chunks]                       # [B, K]
    csum = jnp.sum(rows, axis=1)
    cmax = jnp.max(rows, axis=1)
    cmin = jnp.min(jnp.where(rows > 0.0, rows, jnp.inf), axis=1)
    return ChunkedTreeState(
        priority=leaves,
        chunk_sum=state.chunk_sum.at[chunks].set(csum),
        chunk_max=state.chunk_max.at[chunks].set(cmax),
        chunk_min=state.chunk_min.at[chunks].set(cmin),
    )


def _chunked_sample(
    state: ChunkedTreeState, u: jax.Array, batch_size: int
) -> tuple[jax.Array, jax.Array]:
    """Stratified sampling as two dense cumsum+compare passes.

    Selects, per draw, the first leaf whose cumulative priority reaches the
    target — identical semantics to the heap descent (``v > left`` goes
    right ⇔ first cumsum ≥ v).
    """
    c = state.capacity
    k = _chunk_size(c)
    m = c // k
    cums = jnp.cumsum(state.chunk_sum)                        # [M]
    # The segment width MUST come from the same sequential cumsum the
    # selection compares against: jnp.sum(chunk_sum) (state.total) is a
    # tree reduction that can exceed cums[-1] by an f32 ulp, pushing the
    # top stratified draws past every chunk edge — the edge clips then
    # land on an empty trailing chunk/leaf and sample priority-0
    # (never-written) slots while the buffer is still filling.
    total = cums[-1]
    seg = total / batch_size
    offsets = jnp.arange(batch_size, dtype=jnp.float32)
    v = jnp.minimum((offsets + u) * seg, total)               # [B]

    chunk = jnp.sum((cums[None, :] < v[:, None]).astype(jnp.int32), axis=1)
    chunk = jnp.minimum(chunk, m - 1)                         # float-edge clip
    base = jnp.where(chunk > 0, cums[jnp.maximum(chunk - 1, 0)], 0.0)
    v_in = v - base

    rows = state.priority.reshape(m, k)[chunk]                # [B, K]
    rcum = _row_prefix_sum(rows)                              # [B, K] (MXU)
    # Same ulp hazard within the chunk: v_in is bounded by the STORED
    # chunk_sum, which can exceed this row cumsum's last entry; clamp so
    # equality selects the first leaf reaching the total (a written one).
    v_in = jnp.minimum(v_in, rcum[:, -1])
    off = jnp.sum((rcum < v_in[:, None]).astype(jnp.int32), axis=1)
    off = jnp.minimum(off, k - 1)
    leaf_idx = chunk * k + off
    priority = jnp.take_along_axis(rows, off[:, None], axis=1)[:, 0]
    return leaf_idx, priority


def heap_to_chunked(state: SumTreeState) -> ChunkedTreeState:
    """Exact conversion (checkpoint migration): heap leaves carry the full
    information; the chunk reductions are recomputed from them."""
    c = state.capacity
    k = _chunk_size(c)
    m = c // k
    rows = state.sum_tree[c:].reshape(m, k)
    return ChunkedTreeState(
        priority=state.sum_tree[c:],
        chunk_sum=jnp.sum(rows, axis=1),
        chunk_max=jnp.max(rows, axis=1),
        chunk_min=jnp.min(jnp.where(rows > 0.0, rows, jnp.inf), axis=1),
    )


# ---------------------------------------------------------------------------
# Dispatch — one functional API over both structures.
# ---------------------------------------------------------------------------


def update(state, leaf_idx: jax.Array, priority: jax.Array,
           assume_unique: bool = False):
    if isinstance(state, ChunkedTreeState):
        return _chunked_update(state, leaf_idx, priority, assume_unique)
    return _heap_update(state, leaf_idx, priority, assume_unique)


def sample(state, u: jax.Array, batch_size: int):
    if isinstance(state, ChunkedTreeState):
        return _chunked_sample(state, u, batch_size)
    return _heap_sample(state, u, batch_size)
