"""On-device sum tree vs a straightforward numpy oracle."""

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_drl_rmc_tpu.ops import sum_tree as st


def make_tree_with(priorities):
    state = st.init(len(priorities) if len(priorities) > 1 else 2)
    idx = jnp.arange(len(priorities), dtype=jnp.int32)
    return st.update(state, idx, jnp.asarray(priorities, jnp.float32))


def test_total_max_min():
    p = [0.5, 2.0, 1.0, 0.25]
    tree = make_tree_with(p)
    assert float(tree.total) == sum(p)
    assert float(tree.max_priority) == max(p)
    assert float(tree.min_priority) == min(p)


def test_update_overwrites_and_repairs():
    tree = make_tree_with([1.0, 1.0, 1.0, 1.0])
    tree = st.update(tree, jnp.array([2], jnp.int32), jnp.array([5.0], jnp.float32))
    assert float(tree.total) == 8.0
    assert float(tree.max_priority) == 5.0
    assert float(tree.min_priority) == 1.0
    # Lower the max back down; exact max maintenance must recover 1.0.
    tree = st.update(tree, jnp.array([2], jnp.int32), jnp.array([0.5], jnp.float32))
    assert float(tree.max_priority) == 1.0
    assert float(tree.min_priority) == 0.5


def test_duplicate_indices_last_wins():
    tree = make_tree_with([1.0, 1.0])
    tree = st.update(
        tree, jnp.array([0, 0], jnp.int32), jnp.array([3.0, 7.0], jnp.float32)
    )
    assert float(tree.total) == 8.0
    assert float(tree.max_priority) == 7.0


def test_sample_descent_targets_correct_leaf():
    # Priorities [1, 2, 3, 4]; cumulative [1, 3, 6, 10].
    tree = make_tree_with([1.0, 2.0, 3.0, 4.0])
    # One stratified draw: batch 1 -> v = u * total. Pick u so v = 4.5 -> leaf 2.
    idx, pr = st.sample(tree, jnp.array([0.45]), 1)
    assert int(idx[0]) == 2
    assert float(pr[0]) == 3.0


def test_sample_distribution_proportional():
    caps = [1.0, 2.0, 3.0, 4.0]
    tree = make_tree_with(caps)
    n = 4096
    u = jax.random.uniform(jax.random.PRNGKey(0), (n,))
    idx, _ = st.sample(tree, u, n)
    counts = np.bincount(np.asarray(idx), minlength=4) / n
    np.testing.assert_allclose(counts, np.array(caps) / sum(caps), atol=0.02)


def test_is_weights_match_reference_formula():
    # Reference replay_memory.py:76-86.
    tree = make_tree_with([1.0, 2.0, 3.0, 4.0])
    size, beta = 4, 0.5
    priority = jnp.array([3.0])
    w = st.is_weights(tree, priority, size, jnp.float32(beta))
    total = 10.0
    max_w = (size * (1.0 / total)) ** -beta
    expected = (size * (3.0 / total)) ** -beta / max_w
    np.testing.assert_allclose(float(w[0]), expected, rtol=1e-5)


def test_nonpow2_capacity_padding():
    state = st.init(5)  # pads to 8
    assert state.capacity == 8
    idx = jnp.arange(5, dtype=jnp.int32)
    state = st.update(state, idx, jnp.ones(5, jnp.float32))
    assert float(state.total) == 5.0
    u = jax.random.uniform(jax.random.PRNGKey(1), (256,))
    leaf, _ = st.sample(state, u, 256)
    assert int(jnp.max(leaf)) <= 4  # never selects an empty padded leaf


def test_jit_update_sample_roundtrip():
    state = st.init(16)
    upd = jax.jit(st.update)
    for i in range(16):
        state = upd(state, jnp.array([i], jnp.int32), jnp.array([float(i + 1)], jnp.float32))
    assert float(state.total) == sum(range(1, 17))
    idx, pr = jax.jit(st.sample, static_argnums=2)(state, jnp.full((8,), 0.5), 8)
    assert np.all(np.asarray(pr) == np.asarray(idx) + 1)
