"""Unit tests for pure TD-loss functions against hand-computed values."""

import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_drl_rmc_tpu.ops.losses import (
    Batch,
    beta_schedule,
    epsilon_schedule,
    huber,
    polyak_update,
    q_at_actions,
    td_targets_double,
    td_targets_max,
)


def test_huber_matches_smooth_l1():
    x = jnp.array([-2.0, -0.5, 0.0, 0.5, 1.0, 3.0])
    expected = np.array([1.5, 0.125, 0.0, 0.125, 0.5, 2.5])
    np.testing.assert_allclose(np.asarray(huber(x)), expected, rtol=1e-6)


def test_td_targets_max():
    tq = jnp.array([[1.0, 3.0], [2.0, 0.0]])
    r = jnp.array([1.0, 2.0])
    d = jnp.array([0.0, 1.0])
    out = td_targets_max(tq, r, d, gamma=0.5)
    np.testing.assert_allclose(np.asarray(out), [1.0 + 0.5 * 3.0, 2.0])


def test_td_targets_double_uses_online_argmax():
    online = jnp.array([[0.0, 10.0]])   # argmax -> action 1
    target = jnp.array([[5.0, 1.0]])    # target value of action 1 = 1.0
    out = td_targets_double(online, target, jnp.array([0.0]), jnp.array([0.0]), 1.0)
    np.testing.assert_allclose(np.asarray(out), [1.0])


def test_q_at_actions():
    q = jnp.array([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]])
    a = jnp.array([2, 0])
    np.testing.assert_allclose(np.asarray(q_at_actions(q, a)), [3.0, 4.0])


def test_polyak_update():
    t = {"w": jnp.array([0.0])}
    o = {"w": jnp.array([1.0])}
    out = polyak_update(t, o, tau=0.1)
    np.testing.assert_allclose(np.asarray(out["w"]), [0.1])


@pytest.mark.parametrize("exp_decay", [True, False])
def test_epsilon_schedule_endpoints(exp_decay):
    kw = dict(n_env=1, eps_start=1.0, eps_min=0.01, eps_dec=100.0, exp_decay=exp_decay)
    assert float(epsilon_schedule(jnp.float32(0), **kw)) == pytest.approx(1.0)
    assert float(epsilon_schedule(jnp.float32(100), **kw)) == pytest.approx(0.01, rel=1e-4)
    assert float(epsilon_schedule(jnp.float32(1000), **kw)) == pytest.approx(0.01, rel=1e-4)


def test_epsilon_exponential_midpoint():
    # Matches reference agent.py:86-90: exp(interp in log space).
    val = epsilon_schedule(jnp.float32(50), 1, 1.0, 0.01, 100.0, True)
    assert float(val) == pytest.approx(np.exp((np.log(1.0) + np.log(0.01)) / 2), rel=1e-4)


def test_epsilon_n_env_scaling():
    # step * n_env drives the schedule (reference agent.py:88).
    v1 = epsilon_schedule(jnp.float32(25), 4, 1.0, 0.01, 100.0, False)
    v2 = epsilon_schedule(jnp.float32(100), 1, 1.0, 0.01, 100.0, False)
    assert float(v1) == pytest.approx(float(v2))


def test_beta_schedule():
    assert float(beta_schedule(0, 0.4, 1.0, 100.0)) == pytest.approx(0.4)
    assert float(beta_schedule(50, 0.4, 1.0, 100.0)) == pytest.approx(0.7)
    assert float(beta_schedule(200, 0.4, 1.0, 100.0)) == pytest.approx(1.0)


# --- C51 distributional loss (TPU-build extension) -------------------------


def test_categorical_project_identity_and_shift():
    from multimodal_drl_rmc_tpu.ops.losses import categorical_project

    support = jnp.linspace(-2.0, 2.0, 5)          # dz = 1
    p = jnp.asarray([[0.0, 0.0, 1.0, 0.0, 0.0]])  # all mass at z=0
    # gamma=1, r=0, not done: identity projection.
    out = categorical_project(p, jnp.zeros(1), jnp.zeros(1), 1.0, support)
    np.testing.assert_allclose(np.asarray(out), np.asarray(p), atol=1e-6)
    # r=0.5 shifts half the mass to each neighbor of 0.5.
    out = categorical_project(p, jnp.asarray([0.5]), jnp.zeros(1), 1.0, support)
    np.testing.assert_allclose(np.asarray(out[0]),
                               [0.0, 0.0, 0.5, 0.5, 0.0], atol=1e-6)
    # done: collapse to delta at r (here r=2 -> top atom), regardless of p.
    out = categorical_project(p, jnp.asarray([2.0]), jnp.ones(1), 0.9, support)
    np.testing.assert_allclose(np.asarray(out[0]),
                               [0.0, 0.0, 0.0, 0.0, 1.0], atol=1e-6)
    # clipping: r beyond v_max lands on the top atom.
    out = categorical_project(p, jnp.asarray([7.0]), jnp.ones(1), 0.9, support)
    np.testing.assert_allclose(np.asarray(out[0]),
                               [0.0, 0.0, 0.0, 0.0, 1.0], atol=1e-6)
    # mass is conserved.
    import jax

    rng = jax.random.PRNGKey(0)
    pr = jax.nn.softmax(jax.random.normal(rng, (7, 5)), axis=-1)
    r = jax.random.uniform(rng, (7,), minval=-3.0, maxval=3.0)
    out = categorical_project(pr, r, jnp.zeros(7), 0.99, support)
    np.testing.assert_allclose(np.asarray(out.sum(-1)), np.ones(7), atol=1e-5)


def test_qr_loss_converges_to_quantiles():
    """Minimizing the quantile-Huber loss over a fixed target sample set
    drives the predicted quantiles toward the sample distribution's
    quantiles (here: targets ~ {0, 10} equally likely -> the low/high
    quantile estimates straddle both modes, mean ~ 5)."""
    import jax

    from multimodal_drl_rmc_tpu.ops.losses import qr_loss

    K = 8
    taus = (2.0 * jnp.arange(K) + 1.0) / (2.0 * K)
    theta0 = jnp.zeros((1, 1, K))  # one state, one action

    def quantiles_fn(params, x):
        return jnp.broadcast_to(params, (x.shape[0], 1, K))

    b = 64
    rng = np.random.RandomState(0)
    rewards = jnp.asarray(rng.choice([0.0, 10.0], size=b).astype(np.float32))
    batch = Batch(obs=jnp.zeros((b, 2)), action=jnp.zeros(b, jnp.int32),
                  reward=rewards, done=jnp.ones(b), next_obs=jnp.zeros((b, 2)))

    import optax
    opt = optax.adam(0.5)
    params = theta0
    state = opt.init(params)
    grad = jax.jit(jax.grad(lambda p: qr_loss(
        quantiles_fn, p, p, batch, 0.99, taus, double=False)[0]))
    for _ in range(300):
        g = grad(params)
        upd, state = opt.update(g, state)
        params = optax.apply_updates(params, upd)
    q = np.asarray(params[0, 0])
    sample_mean = float(np.asarray(rewards).mean())
    assert q[0] < 2.0 and q[-1] > 8.0      # extreme quantiles hit the modes
    assert abs(q.mean() - sample_mean) < 1.0   # mean-Q ~ sample mean
    assert np.all(np.diff(q) >= -0.5)      # approximately monotone
