"""DQN learner: end-to-end learning sanity + schedule semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_drl_rmc_tpu.config import Config, EnvConfig, HyperParams, NetworkSpec
from multimodal_drl_rmc_tpu.agents.dqn import ALGO_FLAGS, make_learner
from multimodal_drl_rmc_tpu.ops.losses import Batch


def tiny_config(algo: str, **hp_kw) -> Config:
    env = EnvConfig(obs_variant="macro_no_lane")
    hp = HyperParams(
        algo=algo, batch_size=16, max_mem=256, min_mem=32, lr=5e-3,
        eps_dec=100.0, **hp_kw,
    )
    # C51: support sized to the bandit's 0/1 reward scale (the production
    # default is calibrated to the traffic domain's Q range).
    net = NetworkSpec(kind="mlp", macro_len=8, mlp_hidden=(32, 32),
                      dueling=ALGO_FLAGS[algo][1],
                      v_min=-1.0, v_max=2.0)
    return Config(env=env, hp=hp, net=net)


def _best_action(obs):
    return (obs[:, 0] > 0.5).astype(jnp.int32)  # 0 or 1


def synthetic_bandit_batch(rng, n=64, obs_size=8):
    """Contextual bandit: reward 1 iff action matches a threshold on obs[0]."""
    obs = jax.random.uniform(rng, (n, obs_size))
    action = jax.random.randint(jax.random.fold_in(rng, 1), (n,), 0, 8)
    reward = (action == _best_action(obs)).astype(jnp.float32)
    done = jnp.ones(n, jnp.float32)  # bandit: every transition terminal
    return Batch(obs=obs, action=action, reward=reward, done=done, next_obs=obs)


@pytest.mark.parametrize("algo", list(ALGO_FLAGS))
def test_learner_improves_on_bandit(algo):
    cfg = tiny_config(algo)
    learner = make_learner(cfg)
    state = learner.init_state(jax.random.PRNGKey(0))
    buffer = learner.init_buffer()

    for i in range(4):
        batch = synthetic_bandit_batch(jax.random.PRNGKey(i), n=64)
        buffer = learner.insert(buffer, batch)

    rng = jax.random.PRNGKey(42)
    state, buffer, m0 = learner.train_step(state, buffer, rng)
    state, buffer, m1 = learner.train_many(state, buffer, jax.random.PRNGKey(1), 800)
    assert float(m1.loss) < float(m0.loss)

    test_obs = jax.random.uniform(jax.random.PRNGKey(99), (256, 8))
    actions = learner.greedy_actions(state.params, test_obs)
    acc = float(jnp.mean((actions == _best_action(test_obs)).astype(jnp.float32)))
    assert acc > 0.9, f"{algo}: greedy accuracy {acc}"
    assert int(state.step) == 801


def test_epsilon_greedy_explores_at_start():
    cfg = tiny_config("DQNAgent")
    learner = make_learner(cfg)
    state = learner.init_state(jax.random.PRNGKey(0))
    obs = jnp.zeros((512, 8))
    a = learner.select_actions(state, obs, jax.random.PRNGKey(1))
    # eps at step 0 is 1.0 -> actions are uniform random, all 8 appear.
    assert len(set(np.asarray(a).tolist())) == 8


def test_greedy_after_decay():
    cfg = tiny_config("DQNAgent")
    learner = make_learner(cfg)
    state = learner.init_state(jax.random.PRNGKey(0))
    state = state._replace(step=jnp.asarray(10_000, jnp.int32))
    obs = jnp.tile(jnp.arange(8, dtype=jnp.float32)[None, :], (64, 1))
    a = np.asarray(learner.select_actions(state, obs, jax.random.PRNGKey(2)))
    greedy = np.asarray(learner.greedy_actions(state.params, obs))
    assert (a == greedy).mean() > 0.95  # eps_min = 0.01


def _first_kernel(params):
    leaves = jax.tree_util.tree_leaves_with_path(params)
    for path, leaf in leaves:
        if "kernel" in str(path):
            return leaf
    raise AssertionError("no kernel leaf")


def test_hard_target_update():
    cfg = tiny_config("DQNAgent", target_soft_update=False, target_update_freq=4, n_env=1)
    learner = make_learner(cfg)
    state = learner.init_state(jax.random.PRNGKey(0))
    buffer = learner.init_buffer()
    buffer = learner.insert(buffer, synthetic_bandit_batch(jax.random.PRNGKey(0)))

    def diff(s):
        return float(
            jnp.sum(jnp.abs(_first_kernel(s.params) - _first_kernel(s.target_params)))
        )

    for i in range(3):
        state, buffer, _ = learner.train_step(state, buffer, jax.random.PRNGKey(i))
        assert diff(state) > 0  # steps 1..3: target is stale
    state, buffer, _ = learner.train_step(state, buffer, jax.random.PRNGKey(9))
    assert diff(state) == 0  # step 4: hard sync


def test_soft_target_update_tracks_online():
    cfg = tiny_config("DoubleDQNAgent", target_soft_update=True,
                      target_soft_update_tau=0.5)
    learner = make_learner(cfg)
    state = learner.init_state(jax.random.PRNGKey(0))
    buffer = learner.init_buffer()
    buffer = learner.insert(buffer, synthetic_bandit_batch(jax.random.PRNGKey(0)))
    w_init = np.asarray(_first_kernel(state.params))  # copy before donation
    s1, buffer, _ = learner.train_step(state, buffer, jax.random.PRNGKey(1))
    w_t = _first_kernel(s1.target_params)
    w_o = _first_kernel(s1.params)
    np.testing.assert_allclose(
        np.asarray(w_t), np.asarray(0.5 * w_o + 0.5 * w_init), atol=1e-6
    )


def test_per_priorities_change_after_training():
    cfg = tiny_config("PerDuelingDoubleDQNAgent")
    learner = make_learner(cfg)
    state = learner.init_state(jax.random.PRNGKey(0))
    buffer = learner.init_buffer()
    buffer = learner.insert(buffer, synthetic_bandit_batch(jax.random.PRNGKey(0)))
    t0 = float(buffer.tree.total)
    state, buffer, _ = learner.train_step(state, buffer, jax.random.PRNGKey(1))
    assert float(buffer.tree.total) != t0


def test_cosine_lr_schedule_decays_updates():
    """lr_schedule='cosine' with lr_end=0 over 2 updates: by the 3rd train
    step the learning rate has decayed to ~0, so parameters stop moving
    (const-lr control keeps moving)."""
    import jax.tree_util as jtu

    def run(schedule):
        cfg = tiny_config("DQNAgent", lr_schedule=schedule, lr_end=0.0,
                          lr_decay_steps=2, max_total_steps=8)
        ln = make_learner(cfg)
        rng = jax.random.PRNGKey(0)
        state = ln.init_state(rng)
        buf = ln.insert(ln.init_buffer(), synthetic_bandit_batch(rng))
        deltas = []
        for i in range(4):
            prev = jtu.tree_map(jnp.copy, state.params)
            state, buf, _ = ln.train_step(state, buf, jax.random.fold_in(rng, i))
            deltas.append(sum(float(jnp.abs(a - b).sum()) for a, b in
                              zip(jtu.tree_leaves(state.params),
                                  jtu.tree_leaves(prev))))
        return deltas

    cos = run("cosine")
    const = run("const")
    assert cos[0] > 0 and const[3] > 1e-6
    assert cos[3] < 1e-3 * cos[0]  # decayed to ~zero by step 4


def test_noisy_net_exploration_and_sigma_learning():
    """NoisyNet agent: exploration comes from sampled factorized noise
    (actions vary across rng draws, deterministic per draw), sigma params
    exist on both heads and move under training, and the mean-weight
    greedy path is noise-free."""
    cfg = tiny_config("NoisyPerDuelingDQNAgent")
    learner = make_learner(cfg)
    assert learner.net.spec.noisy
    rng = jax.random.PRNGKey(0)
    state = learner.init_state(rng)
    p = state.params["params"]
    for head in ("fc_val", "fc_adv"):
        assert "kernel_sigma" in p[head] and "bias_sigma" in p[head]

    obs = jax.random.uniform(jax.random.PRNGKey(1), (64, 8))
    a1 = learner.select_actions(state, obs, jax.random.PRNGKey(2))
    a1b = learner.select_actions(state, obs, jax.random.PRNGKey(2))
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a1b))
    diffs = sum(
        int((np.asarray(learner.select_actions(state, obs,
                                               jax.random.PRNGKey(k)))
             != np.asarray(a1)).sum())
        for k in range(3, 13))
    assert diffs > 0, "noise draws should perturb at least some actions"

    # Greedy (mean weights) ignores the rng entirely.
    g = learner.greedy_actions(state.params, obs)
    g2 = learner.greedy_actions(state.params, obs)
    np.testing.assert_array_equal(np.asarray(g), np.asarray(g2))

    buffer = learner.insert(learner.init_buffer(),
                            synthetic_bandit_batch(rng))
    sig0 = np.asarray(p["fc_adv"]["kernel_sigma"]).copy()
    for i in range(20):
        state, buffer, m = learner.train_step(
            state, buffer, jax.random.fold_in(rng, i))
    assert np.isfinite(float(m.loss))
    sig1 = np.asarray(state.params["params"]["fc_adv"]["kernel_sigma"])
    assert float(np.abs(sig1 - sig0).sum()) > 0, "sigma gets gradients"


@pytest.mark.parametrize("algo,kind", [("NoisyQrDuelingDQNAgent", "qr"),
                                       ("NoisyC51DuelingDQNAgent", "c51"),
                                       ("NoisyIqnDuelingDQNAgent", "iqn")])
def test_noisy_distributional_full_rainbow(algo, kind):
    """Full-Rainbow composition (noisy heads over a distributional head):
    sigma params exist on both K-atom heads and move under training,
    exploration varies across noise draws but is deterministic per draw,
    greedy eval uses mean weights, and the .pack round-trip preserves the
    greedy policy (sigma rides alongside the mu weights). NoisyIqn: the
    noisy heads sit over the implicit-quantile network — per-tau output
    width n_actions, tau_embed stays a plain (noise-free) Dense."""
    from multimodal_drl_rmc_tpu.models import packio

    cfg = tiny_config(algo)
    learner = make_learner(cfg)
    spec = learner.net.spec
    assert spec.noisy and spec.n_atoms > 1 and spec.dist_kind == kind
    rng = jax.random.PRNGKey(0)
    state = learner.init_state(rng)
    p = state.params["params"]
    for head in ("fc_val", "fc_adv"):
        assert "kernel_sigma" in p[head] and "bias_sigma" in p[head]
    if kind == "iqn":
        # Implicit head: per-tau width is n_actions; cosine embedding
        # is deterministic shared structure (no sigma).
        assert p["fc_adv"]["kernel"].shape[-1] == 8
        assert "kernel_sigma" not in p["tau_embed"]
    else:
        assert p["fc_adv"]["kernel"].shape[-1] == 8 * spec.n_atoms

    obs = jax.random.uniform(jax.random.PRNGKey(1), (64, 8))
    a1 = learner.select_actions(state, obs, jax.random.PRNGKey(2))
    a1b = learner.select_actions(state, obs, jax.random.PRNGKey(2))
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a1b))
    diffs = sum(
        int((np.asarray(learner.select_actions(state, obs,
                                               jax.random.PRNGKey(k)))
             != np.asarray(a1)).sum())
        for k in range(3, 13))
    assert diffs > 0, "noise draws should perturb at least some actions"

    buffer = learner.insert(learner.init_buffer(),
                            synthetic_bandit_batch(rng))
    sig0 = np.asarray(p["fc_adv"]["kernel_sigma"]).copy()
    for i in range(20):
        state, buffer, m = learner.train_step(
            state, buffer, jax.random.fold_in(rng, i))
    assert np.isfinite(float(m.loss))
    sig1 = np.asarray(state.params["params"]["fc_adv"]["kernel_sigma"])
    assert float(np.abs(sig1 - sig0).sum()) > 0, "sigma gets gradients"

    # .pack round-trip: mean policy and sigma survive; greedy is noise-free.
    g = np.asarray(learner.greedy_actions(state.params, obs))
    path = f"/tmp/test_rainbow_{algo}_model.pack"
    packio.save_pack(path, state.params, spec, step=20)
    params2, meta = packio.load_pack(path, spec)
    assert meta["step"] == 20
    np.testing.assert_array_equal(
        g, np.asarray(learner.greedy_actions(params2, obs)))
    np.testing.assert_allclose(
        sig1, np.asarray(params2["params"]["fc_adv"]["kernel_sigma"]))


def test_iqn_implicit_quantiles():
    """IQN agent: the same parameters evaluate arbitrary tau inputs
    (different taus -> different quantile values), the loss demands an
    rng (sampled taus), greedy eval on the fixed midpoint grid is
    deterministic, and the .pack round-trip (incl. the tau_embed layer)
    preserves the greedy policy."""
    from multimodal_drl_rmc_tpu.models import packio

    cfg = tiny_config("IqnDuelingDQNAgent")
    learner = make_learner(cfg)
    spec = learner.net.spec
    assert spec.dist_kind == "iqn" and spec.n_atoms > 1 and not spec.noisy
    rng = jax.random.PRNGKey(0)
    state = learner.init_state(rng)
    p = state.params["params"]
    assert "tau_embed" in p
    # Implicit head: per-tau output width is n_actions, not A*K.
    assert p["fc_adv"]["kernel"].shape[-1] == 8

    obs = jax.random.uniform(jax.random.PRNGKey(1), (16, 8))
    net = learner.net
    q_lo = net.apply(state.params, obs, jnp.full((16, 4), 0.1),
                     method=net.quantiles_at)
    q_hi = net.apply(state.params, obs, jnp.full((16, 4), 0.9),
                     method=net.quantiles_at)
    assert q_lo.shape == (16, 8, 4)
    assert float(jnp.abs(q_lo - q_hi).max()) > 0, \
        "tau input must modulate the quantile values"

    # Greedy (fixed midpoint grid) is deterministic and rng-free.
    g = np.asarray(learner.greedy_actions(state.params, obs))
    np.testing.assert_array_equal(
        g, np.asarray(learner.greedy_actions(state.params, obs)))

    buffer = learner.insert(learner.init_buffer(),
                            synthetic_bandit_batch(rng))
    for i in range(20):
        state, buffer, m = learner.train_step(
            state, buffer, jax.random.fold_in(rng, i))
    assert np.isfinite(float(m.loss))

    g = np.asarray(learner.greedy_actions(state.params, obs))
    path = "/tmp/test_iqn_model.pack"
    packio.save_pack(path, state.params, spec, step=20)
    params2, _ = packio.load_pack(path, spec)
    np.testing.assert_array_equal(
        g, np.asarray(learner.greedy_actions(params2, obs)))
