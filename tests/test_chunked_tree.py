"""Chunked (two-level) PER tree: semantics, heap parity, ckpt migration.

The chunked tree (ops/sum_tree.py ChunkedTreeState) is the TPU-shaped
default for prioritized replay; it must be observationally equivalent to
the heap tree — same totals/max/min, same stratified-sample leaf choices —
since both implement the reference's SumTree semantics
(dqn/utils/sum_tree.py:4-73, replay_memory.py:76-98).
"""

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_drl_rmc_tpu.ops import replay, sum_tree as st
from multimodal_drl_rmc_tpu.runtime import checkpoint as ckpt


def make_chunked_with(priorities):
    state = st.init_chunked(max(len(priorities), 2))
    idx = jnp.arange(len(priorities), dtype=jnp.int32)
    return st.update(state, idx, jnp.asarray(priorities, jnp.float32))


def test_total_max_min():
    p = [0.5, 2.0, 1.0, 0.25]
    tree = make_chunked_with(p)
    assert float(tree.total) == sum(p)
    assert float(tree.max_priority) == max(p)
    assert float(tree.min_priority) == min(p)


def test_update_overwrites_and_recovers_extrema():
    tree = make_chunked_with([1.0, 1.0, 1.0, 1.0])
    tree = st.update(tree, jnp.array([2], jnp.int32), jnp.array([5.0], jnp.float32))
    assert float(tree.total) == 8.0
    assert float(tree.max_priority) == 5.0
    # Lowering the max must recover the true max (exact recompute of the
    # touched chunk, not a cached bound).
    tree = st.update(tree, jnp.array([2], jnp.int32), jnp.array([0.5], jnp.float32))
    assert float(tree.max_priority) == 1.0
    assert float(tree.min_priority) == 0.5


def test_duplicate_indices_last_wins():
    tree = make_chunked_with([1.0, 1.0])
    tree = st.update(
        tree, jnp.array([0, 0], jnp.int32), jnp.array([3.0, 7.0], jnp.float32)
    )
    assert float(tree.total) == 8.0
    assert float(tree.max_priority) == 7.0


def test_sample_targets_correct_leaf():
    tree = make_chunked_with([1.0, 2.0, 3.0, 4.0])
    idx, pr = st.sample(tree, jnp.array([0.45]), 1)  # v = 4.5 -> leaf 2
    assert int(idx[0]) == 2
    assert float(pr[0]) == 3.0


def test_sample_distribution_proportional():
    caps = [1.0, 2.0, 3.0, 4.0]
    tree = make_chunked_with(caps)
    n = 4096
    u = jax.random.uniform(jax.random.PRNGKey(0), (n,))
    idx, _ = st.sample(tree, u, n)
    counts = np.bincount(np.asarray(idx), minlength=4) / n
    np.testing.assert_allclose(counts, np.array(caps) / sum(caps), atol=0.02)


def test_nonpow2_capacity_never_selects_padding():
    state = st.init_chunked(5)  # pads to 8
    assert state.capacity == 8
    idx = jnp.arange(5, dtype=jnp.int32)
    state = st.update(state, idx, jnp.ones(5, jnp.float32))
    assert float(state.total) == 5.0
    u = jax.random.uniform(jax.random.PRNGKey(1), (256,))
    leaf, _ = st.sample(state, u, 256)
    assert int(jnp.max(leaf)) <= 4


def test_multi_chunk_layout():
    # Capacity large enough for several chunks even at the test-scale K.
    c = 4096
    state = st.init_chunked(c)
    k = st._chunk_size(c)
    assert state.chunk_sum.shape[0] == c // k > 1
    rng = np.random.RandomState(7)
    idx = rng.choice(c, 300, replace=False).astype(np.int32)
    pri = rng.uniform(0.01, 2.0, 300).astype(np.float32)
    state = st.update(state, jnp.asarray(idx), jnp.asarray(pri))
    np.testing.assert_allclose(float(state.total), pri.sum(), rtol=1e-5)
    np.testing.assert_allclose(float(state.max_priority), pri.max(), rtol=1e-6)
    np.testing.assert_allclose(float(state.min_priority), pri.min(), rtol=1e-6)
    # Sampling never lands on an empty (zero-priority) slot.
    u = jax.random.uniform(jax.random.PRNGKey(3), (512,))
    leaf, p = st.sample(state, u, 512)
    assert set(np.asarray(leaf).tolist()) <= set(idx.tolist())
    assert float(jnp.min(p)) > 0.0


def test_heap_parity_on_random_op_sequence():
    """Same op sequence -> identical observables on both structures.

    Integer-valued priorities keep every partial sum exactly representable
    in f32, so the two different summation orders (heap pairwise vs chunked
    cumsum) cannot diverge and sample boundaries are bit-identical.
    """
    cap = 2048  # two K=1024 chunks — crosses the chunk boundary
    heap = st.init(cap)
    chunk = st.init_chunked(cap)
    rng = np.random.RandomState(0)
    for step in range(20):
        b = int(rng.randint(1, 9))
        idx = jnp.asarray(rng.randint(0, cap, b), jnp.int32)
        pri = jnp.asarray(rng.randint(1, 33, b).astype(np.float32))
        heap = st.update(heap, idx, pri)
        chunk = st.update(chunk, idx, pri)
        assert float(heap.total) == float(chunk.total)
        assert float(heap.max_priority) == float(chunk.max_priority)
        assert float(heap.min_priority) == float(chunk.min_priority)
        u = jnp.asarray(rng.uniform(0, 1, 16).astype(np.float32))
        hl, hp_ = st.sample(heap, u, 16)
        cl, cp = st.sample(chunk, u, 16)
        np.testing.assert_array_equal(np.asarray(hl), np.asarray(cl))
        np.testing.assert_array_equal(np.asarray(hp_), np.asarray(cp))
        w_h = st.is_weights(heap, hp_, cap, jnp.float32(0.7))
        w_c = st.is_weights(chunk, cp, cap, jnp.float32(0.7))
        np.testing.assert_allclose(np.asarray(w_h), np.asarray(w_c), rtol=1e-6)


def test_heap_to_chunked_conversion_exact():
    heap = st.init(32)
    rng = np.random.RandomState(1)
    idx = jnp.asarray(rng.choice(32, 20, replace=False), jnp.int32)
    pri = jnp.asarray(rng.uniform(0.05, 3.0, 20).astype(np.float32))
    heap = st.update(heap, idx, pri)
    conv = st.heap_to_chunked(heap)
    np.testing.assert_allclose(float(conv.total), float(heap.total), rtol=1e-6)
    assert float(conv.max_priority) == float(heap.max_priority)
    assert float(conv.min_priority) == float(heap.min_priority)
    u = jnp.asarray(rng.uniform(0, 1, 64).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(st.sample(heap, u, 64)[0]), np.asarray(st.sample(conv, u, 64)[0])
    )


def test_full_checkpoint_migrates_heap_payload(tmp_path):
    """A full checkpoint written with the heap tree resumes onto a chunked
    template (runtime/checkpoint.py load_full migration) — the in-flight
    long-run scenario when the default flipped."""
    old = replay.init_per(capacity=16, obs_size=2, tree_kind="heap")
    idx = jnp.arange(8, dtype=jnp.int32)
    old = replay.PerReplayData(
        old.data, st.update(old.tree, idx, (jnp.arange(8) + 1.0).astype(jnp.float32))
    )
    path = str(tmp_path / "carry_full.msgpack")
    ckpt.save_full(path, {"buf": old}, {"step": 7})
    template = {"buf": replay.init_per(capacity=16, obs_size=2, tree_kind="chunked")}
    restored, meta = ckpt.load_full(path, template)
    assert meta["step"] == 7
    tree = restored["buf"].tree
    assert isinstance(tree, st.ChunkedTreeState)
    np.testing.assert_allclose(float(tree.total), float(old.tree.total), rtol=1e-6)
    assert float(tree.max_priority) == float(old.tree.max_priority)
    # And a chunked payload round-trips unchanged.
    ckpt.save_full(path, {"buf": restored["buf"]}, {"step": 8})
    again, _ = ckpt.load_full(path, template)
    np.testing.assert_allclose(
        np.asarray(again["buf"].tree.priority), np.asarray(tree.priority)
    )


def test_replay_kind_selection():
    assert isinstance(
        replay.init_per(8, 2, tree_kind="heap").tree, st.SumTreeState
    )
    assert isinstance(
        replay.init_per(8, 2, tree_kind="chunked").tree, st.ChunkedTreeState
    )
    assert isinstance(replay.init_per(8, 2).tree, st.ChunkedTreeState)  # default


def test_partial_fill_never_samples_empty_slots():
    """f32 regression: ``jnp.sum(chunk_sum)`` (a tree reduction) can exceed
    the sequential cumsum's last entry by an ulp (seed 0 below measures a
    +0.0078 gap at 128 chunks), so deriving the stratified segment width
    from it pushed the top draws (u -> 1) past every chunk edge and the
    edge clips landed on never-written (priority-0) trailing slots —
    exactly the default-PER fill phase. The sampler must derive the
    segment width from the same cumsum it selects against and clamp both
    levels."""
    cap, filled = 1 << 17, 77 * 1024          # 128 chunks, 77 written
    k = st._chunk_size(cap)
    m = cap // k
    leaves = np.zeros(cap, np.float32)
    leaves[:filled] = np.random.default_rng(0).uniform(
        0.5, 1.5, filled).astype(np.float32)
    lj = jnp.asarray(leaves)
    rows = lj.reshape(m, k)
    tree = st.ChunkedTreeState(
        priority=lj,
        chunk_sum=jnp.sum(rows, axis=1),
        chunk_max=jnp.max(rows, axis=1),
        chunk_min=jnp.min(jnp.where(rows > 0.0, rows, jnp.inf), axis=1))
    # This tree has the hazardous rounding: the tree-reduced total exceeds
    # the sequential cumsum the sampler compares against.
    assert float(jnp.sum(tree.chunk_sum)) > float(jnp.cumsum(tree.chunk_sum)[-1])
    # u = 1.0 is the top of the stratified interval (reachable both by an
    # f32 uniform draw rounding up and by product rounding in v).
    idx, pr = st.sample(tree, jnp.ones(64, jnp.float32), 64)
    assert int(jnp.max(idx)) < filled, "empty slot sampled"
    assert float(jnp.min(pr)) > 0.0, "zero priority sampled"


def test_sharded_full_checkpoint_migrates_per_shard_heaps(tmp_path):
    """A DP-mesh full save gathers PER trees as ndev CONCATENATED per-shard
    heaps (shard_map P(axis) layout). Migration must split per shard: the
    single-heap reading returns internal node sums as 'priorities' and
    drops every shard but the first (regression for the silent-corruption
    path: round-2 heap save on the mesh -> round-3 chunked resume)."""
    cap, ndev = 8, 2
    heaps, all_leaves = [], []
    for d in range(ndev):
        pri = (jnp.arange(cap) + 1.0 + 10.0 * d).astype(jnp.float32)
        heaps.append(st.update(st.init(cap), jnp.arange(cap, dtype=jnp.int32), pri))
        all_leaves.append(np.asarray(pri))
    gathered = st.SumTreeState(*(
        jnp.concatenate([getattr(h, f) for h in heaps])
        for f in ("sum_tree", "max_tree", "min_tree")))
    path = str(tmp_path / "sharded_full.msgpack")
    ckpt.save_full(path, {"tree": gathered}, {"step": 3, "ndev": ndev})
    # Global chunked template: ndev * cap leaves (concatenated shard order).
    template = {"tree": st.init_chunked(cap * ndev)}
    restored, _ = ckpt.load_full(path, template)
    tree = restored["tree"]
    expect = np.concatenate(all_leaves)
    np.testing.assert_allclose(np.asarray(tree.priority), expect)
    np.testing.assert_allclose(float(tree.total), expect.sum(), rtol=1e-6)
    # Without meta ndev, the caller-passed shard count must be honored too.
    ckpt.save_full(path, {"tree": gathered}, {"step": 3})
    restored2, _ = ckpt.load_full(path, template, ndev=ndev)
    np.testing.assert_allclose(np.asarray(restored2["tree"].priority), expect)
