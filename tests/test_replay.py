"""HBM replay ring buffer + PER buffer semantics."""

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_drl_rmc_tpu.ops import replay
from multimodal_drl_rmc_tpu.ops.losses import Batch


def mk_batch(vals, obs_size=4):
    n = len(vals)
    obs = jnp.stack([jnp.full((obs_size,), v, jnp.float32) for v in vals])
    return Batch(
        obs=obs,
        action=jnp.asarray(vals, jnp.int32) % 3,
        reward=jnp.asarray(vals, jnp.float32),
        done=jnp.zeros(n, jnp.float32),
        next_obs=obs + 0.5,
    )


def test_insert_and_wraparound():
    buf = replay.init(capacity=4, obs_size=4)
    buf = replay.insert(buf, mk_batch([1, 2, 3]))
    assert int(buf.size) == 3 and int(buf.ptr) == 3
    buf = replay.insert(buf, mk_batch([4, 5]))
    assert int(buf.size) == 4 and int(buf.ptr) == 1
    # Slot 0 was overwritten by value 5 (ring semantics).
    np.testing.assert_allclose(np.asarray(buf.reward), [5, 2, 3, 4])


def test_uniform_sample_only_filled_region():
    buf = replay.init(capacity=100, obs_size=4)
    buf = replay.insert(buf, mk_batch([7, 8]))
    b = replay.sample_uniform(buf, jax.random.PRNGKey(0), 64)
    assert set(np.asarray(b.reward).tolist()) <= {7.0, 8.0}
    np.testing.assert_allclose(np.asarray(b.next_obs[:, 0]), np.asarray(b.reward) + 0.5)


def test_per_insert_uses_max_priority():
    buf = replay.init_per(capacity=8, obs_size=4)
    buf = replay.per_insert(buf, mk_batch([1]))
    assert float(buf.tree.max_priority) == 1.0  # empty buffer -> high priority
    buf = replay.per_update_priorities(
        buf, jnp.array([0], jnp.int32), jnp.array([0.1], jnp.float32)
    )
    # p = (0.1 + 1e-4) ** 0.6
    expected = (0.1 + 1e-4) ** 0.6
    np.testing.assert_allclose(float(buf.tree.total), expected, rtol=1e-5)
    # Next insert uses current max priority, not 1.0.
    buf = replay.per_insert(buf, mk_batch([2]))
    np.testing.assert_allclose(float(buf.tree.max_priority), expected, rtol=1e-5)


def test_per_sample_returns_weights_and_indices():
    buf = replay.init_per(capacity=8, obs_size=4)
    buf = replay.per_insert(buf, mk_batch([1, 2, 3, 4]))
    s = replay.per_sample(buf, jax.random.PRNGKey(1), 16, jnp.float32(0.4))
    assert s.batch.obs.shape == (16, 4)
    assert s.leaf_idx.shape == (16,)
    # Equal priorities -> all IS weights are 1.
    np.testing.assert_allclose(np.asarray(s.is_weights), np.ones(16), rtol=1e-5)


def test_per_nonuniform_weights_below_one():
    buf = replay.init_per(capacity=8, obs_size=4)
    buf = replay.per_insert(buf, mk_batch([1, 2, 3, 4]))
    buf = replay.per_update_priorities(
        buf, jnp.arange(4, dtype=jnp.int32),
        jnp.array([0.1, 0.2, 0.4, 0.9], jnp.float32),
    )
    s = replay.per_sample(buf, jax.random.PRNGKey(2), 32, jnp.float32(1.0))
    w = np.asarray(s.is_weights)
    assert np.all(w <= 1.0 + 1e-5) and np.any(w < 0.999)


def test_bf16_storage_roundtrip():
    """obs_dtype=bfloat16: insert casts obs/next_obs down, gather casts back
    to f32, and values match bf16 quantization of the originals exactly;
    action/reward/done stay full precision."""
    buf = replay.init(capacity=8, obs_size=4, obs_dtype=jnp.bfloat16)
    vals = [1.0, 0.1234567, 1234.567]
    buf = replay.insert(buf, mk_batch(vals))
    assert buf.obs.dtype == jnp.bfloat16 and buf.next_obs.dtype == jnp.bfloat16
    got = replay.gather(buf, jnp.arange(3))
    assert got.obs.dtype == jnp.float32
    want = np.asarray(jnp.asarray(vals, jnp.float32).astype(jnp.bfloat16)
                      .astype(jnp.float32))
    np.testing.assert_array_equal(np.asarray(got.obs[:, 0]), want)
    np.testing.assert_array_equal(np.asarray(got.reward),
                                  np.asarray(vals, np.float32))
    # bf16 has an 8-bit mantissa: worst-case relative error < 2^-8.
    rel = np.abs(want - np.asarray(vals)) / np.asarray(vals)
    assert rel.max() < 2 ** -8
