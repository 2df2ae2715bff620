"""Device-resident DQN-family learner.

The reference's agent zoo (dqn/agent.py:150-321 — SimpleAgent / DoubleAgent /
PerDoubleAgent x {plain, dueling} networks) collapses here into one factory,
``make_learner``, that closes over a ``Config`` and returns pure jitted
functions over an explicit ``TrainState``:

  * ``select_actions(state, obs, rng)``   — epsilon-greedy on device
                                            (reference agent.py:92-99)
  * ``train_step(state, buffer, rng)``    — sample + TD loss + Adam + target
                                            update, one fused jit
                                            (reference agent.py:166-272)
  * ``insert(buffer, batch)``             — HBM ring-buffer append
  * ``train_many(state, buffer, rng, k)`` — lax.scan over k train steps, for
                                            replay-ratio > 1 and benchmarks

Buffer and state are donated, so the 100k-1M-transition replay never copies.
Epsilon/target schedules are pure functions of ``state.step`` with the same
``n_env`` scaling as the reference (agent.py:88-90,102,108).
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..config import Config
from ..models.networks import build_network, greedy_fn, init_params
from ..ops import replay
from ..ops.losses import (
    Batch,
    beta_schedule,
    c51_loss,
    dqn_loss,
    epsilon_schedule,
    iqn_loss,
    polyak_update,
    qr_loss,
)


class TrainState(NamedTuple):
    params: Any
    target_params: Any
    opt_state: Any
    step: jax.Array           # [] int32 — agent steps (learn calls)
    episode_count: jax.Array  # [] int32


class Metrics(NamedTuple):
    loss: jax.Array
    mean_q: jax.Array
    epsilon: jax.Array


ALGO_FLAGS = {
    # algo name (reference agent.py:275-321) -> (double, dueling, per, dist)
    "DQNAgent": (False, False, False, False),
    "DoubleDQNAgent": (True, False, False, False),
    "DuelingDoubleDQNAgent": (True, True, False, False),
    "PerDuelingDoubleDQNAgent": (True, True, True, False),
    # TPU-build extensions: distributional heads over the full stack
    # (double + dueling + PER; n-step composes via hp.n_step). The 4th
    # flag is False or the head family ("c51" / "qr").
    "C51DuelingDQNAgent": (True, True, True, "c51"),
    "QrDuelingDQNAgent": (True, True, True, "qr"),
    # IQN (Dabney et al. 2018): taus are sampled inputs, not a fixed grid.
    "IqnDuelingDQNAgent": (True, True, True, "iqn"),
    # NoisyNet exploration (Fortunato et al. 2018) over the scalar flagship
    # stack; epsilon-greedy is disabled (spec.noisy via NOISY_ALGOS).
    "NoisyPerDuelingDQNAgent": (True, True, True, False),
    # Full-Rainbow composition (Hessel et al. 2018): noisy exploration over
    # a distributional head, on top of double + dueling + PER + n-step.
    "NoisyQrDuelingDQNAgent": (True, True, True, "qr"),
    "NoisyC51DuelingDQNAgent": (True, True, True, "c51"),
    "NoisyIqnDuelingDQNAgent": (True, True, True, "iqn"),
}

NOISY_ALGOS = {"NoisyPerDuelingDQNAgent", "NoisyQrDuelingDQNAgent",
               "NoisyC51DuelingDQNAgent", "NoisyIqnDuelingDQNAgent"}


class DQNLearner(NamedTuple):
    """Bundle of pure functions + static metadata for one algo/config."""

    cfg: Config
    net: Any
    init_state: Any          # (rng) -> TrainState
    init_buffer: Any         # () -> ReplayData | PerReplayData
    select_actions: Any      # (state, obs[B,D], rng) -> actions[B]
    greedy_actions: Any      # (params, obs[B,D]) -> actions[B]
    insert: Any              # (buffer, batch) -> buffer
    train_step: Any          # (state, buffer, rng) -> (state, buffer, Metrics)
    train_many: Any          # (state, buffer, rng, k:int static) -> (state, buffer, Metrics)
    is_per: bool
    apply_fn: Any


def spec_for_algo(cfg: Config):
    """Reconcile cfg.net with the algo's flags (dueling head, C51 atoms,
    noisy heads). Single definition shared by the single-chip and DP
    learner builders."""
    double, dueling, per, dist = ALGO_FLAGS[cfg.hp.algo]
    spec = cfg.net
    noisy = cfg.hp.algo in NOISY_ALGOS or spec.noisy
    if noisy and not dueling:
        raise ValueError("noisy heads require a dueling network (only the "
                         "dueling head builders wire NoisyDense)")
    want_atoms = (spec.n_atoms if spec.n_atoms > 1 else 51) if dist else 1
    want_kind = dist if dist else spec.dist_kind
    if spec.dueling != dueling or spec.n_atoms != want_atoms \
            or spec.dist_kind != want_kind or spec.noisy != noisy:
        spec = type(spec)(**{**spec.__dict__, "dueling": dueling,
                             "n_atoms": want_atoms, "dist_kind": want_kind,
                             "noisy": noisy})
    return spec, (double, dueling, per, dist)


def make_tx(hp) -> optax.GradientTransformation:
    """The Adam optimizer incl. the optional cosine lr schedule — shared by
    both learner builders so they cannot drift."""
    if hp.lr_schedule == "cosine":
        decay_steps = hp.lr_decay_steps or hp.max_total_steps
        lr = optax.cosine_decay_schedule(
            hp.lr, decay_steps, alpha=hp.lr_end / hp.lr)
    else:
        lr = hp.lr
    return optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)


def make_loss_fn(net, apply_fn, spec, gamma_n: float, double: bool,
                 dist: bool):
    """(params, target_params, batch, is_weights, rng) -> (loss, |signal|[B]).
    Selects the scalar TD loss or a distributional loss (C51 categorical /
    QR quantile-Huber); shared by the single-chip and DP learner builders.
    ``rng`` feeds the NoisyNet 'noise' collection and is ignored otherwise."""
    if dist == "iqn":
        if spec.noisy:
            # Full-Rainbow NoisyIqn: the head fn takes a noise key and
            # iqn_loss draws independent online/target noise alongside
            # its tau samples.
            quant_at = lambda p, x, t, key: net.apply(
                p, x, t, method=net.quantiles_at, rngs={"noise": key})
        else:
            quant_at = lambda p, x, t: net.apply(p, x, t,
                                                 method=net.quantiles_at)

        def loss(params, target_params, batch, is_w, rng=None):
            if rng is None:
                raise ValueError("iqn loss requires an rng (sampled taus)")
            return iqn_loss(quant_at, params, target_params, batch,
                            gamma_n, rng, n_taus=spec.n_atoms, double=double,
                            is_weights=is_w, noisy=spec.noisy)
    elif dist == "qr":
        # spec.noisy = full Rainbow: the head fn takes a noise key and
        # qr_loss/c51_loss draw independent online/target noise, mirroring
        # dqn_loss's noisy path.
        taus = (2.0 * jnp.arange(spec.n_atoms) + 1.0) / (2.0 * spec.n_atoms)
        if spec.noisy:
            quant_fn = lambda p, x, key: net.apply(
                p, x, method=net.quantiles, rngs={"noise": key})
        else:
            quant_fn = lambda p, x: net.apply(p, x, method=net.quantiles)

        def loss(params, target_params, batch, is_w, rng=None):
            if spec.noisy and rng is None:
                raise ValueError("noisy-head loss requires an rng "
                                 "(independent online/target noise draws)")
            return qr_loss(quant_fn, params, target_params, batch,
                           gamma_n, taus, double=double, is_weights=is_w,
                           rng=rng if spec.noisy else None)
    elif dist:
        support = jnp.linspace(spec.v_min, spec.v_max, spec.n_atoms)
        if spec.noisy:
            logits_fn = lambda p, x, key: net.apply(
                p, x, method=net.logits, rngs={"noise": key})
        else:
            logits_fn = lambda p, x: net.apply(p, x, method=net.logits)

        def loss(params, target_params, batch, is_w, rng=None):
            if spec.noisy and rng is None:
                raise ValueError("noisy-head loss requires an rng "
                                 "(independent online/target noise draws)")
            return c51_loss(logits_fn, params, target_params, batch,
                            gamma_n, support, double=double, is_weights=is_w,
                            rng=rng if spec.noisy else None)
    elif spec.noisy:
        noisy_apply = lambda p, x, key: net.apply(p, x,
                                                  rngs={"noise": key})

        def loss(params, target_params, batch, is_w, rng=None):
            if rng is None:
                raise ValueError("noisy-head loss requires an rng "
                                 "(independent online/target noise draws)")
            return dqn_loss(noisy_apply, params, target_params, batch,
                            gamma_n, double=double, is_weights=is_w,
                            rng=rng)
    else:
        def loss(params, target_params, batch, is_w, rng=None):
            return dqn_loss(apply_fn, params, target_params, batch,
                            gamma_n, double=double, is_weights=is_w)
    return loss


def make_learner(cfg: Config) -> DQNLearner:
    hp = cfg.hp
    spec, (double, dueling, per, dist) = spec_for_algo(cfg)

    n_actions = cfg.env.n_actions
    obs_size = cfg.env.obs_size
    net = build_network(spec, n_actions)
    apply_fn = lambda params, x: net.apply(params, x)
    greedy = greedy_fn(net)

    tx = make_tx(hp)
    obs_dtype = jnp.dtype(hp.obs_dtype)
    gamma_n = hp.gamma ** hp.n_step
    loss_of = make_loss_fn(net, apply_fn, spec, gamma_n, double, dist)

    def init_state(rng: jax.Array) -> TrainState:
        params = init_params(net, obs_size, rng)
        return TrainState(
            params=params,
            target_params=jax.tree_util.tree_map(jnp.copy, params),
            opt_state=tx.init(params),
            step=jnp.zeros((), jnp.int32),
            episode_count=jnp.zeros((), jnp.int32),
        )

    def init_buffer():
        if per:
            return replay.init_per(hp.max_mem, obs_size, obs_dtype)
        return replay.init(hp.max_mem, obs_size, obs_dtype)

    if spec.noisy:
        # NoisyNet replaces epsilon-greedy: actions are greedy under ONE
        # sampled noise draw per call (shared across the env batch, the
        # standard vectorized adaptation of Fortunato et al. 2018).
        # Scalar dueling heads argmax advantages (reference network.py:110-117
        # parity); distributional heads argmax the expected Q (__call__).
        noisy_greedy_method = None if spec.n_atoms > 1 else "advantages"

        @jax.jit
        def select_actions(state: TrainState, obs: jax.Array,
                           rng: jax.Array) -> jax.Array:
            q = net.apply(state.params, obs, method=noisy_greedy_method,
                          rngs={"noise": rng})
            return jnp.argmax(q, axis=-1)
    else:
        @jax.jit
        def select_actions(state: TrainState, obs: jax.Array, rng: jax.Array) -> jax.Array:
            eps = epsilon_schedule(
                state.step.astype(jnp.float32), hp.n_env,
                hp.eps_start, hp.eps_min, hp.eps_dec, hp.eps_dec_exp,
            )
            rng_u, rng_a = jax.random.split(rng)
            greedy_a = greedy(state.params, obs)
            rand_a = jax.random.randint(rng_a, greedy_a.shape, 0, n_actions)
            explore = jax.random.uniform(rng_u, greedy_a.shape) <= eps
            return jnp.where(explore, rand_a, greedy_a)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def insert(buffer, batch: Batch):
        if per:
            return replay.per_insert(buffer, batch, hp.per_max_priority)
        return replay.insert(buffer, batch)

    needs_loss_rng = spec.noisy or dist == "iqn"

    def _one_step(state: TrainState, buffer, rng: jax.Array):
        # Only noisy heads / IQN tau sampling consume a loss-side key;
        # other algos keep their exact pre-existing RNG stream.
        r_noise = None
        if needs_loss_rng:
            rng, r_noise = jax.random.split(rng)
        if per:
            beta = beta_schedule(
                state.step * hp.n_env, hp.per_beta_start, hp.per_beta_end, hp.eps_dec
            )
            samp = replay.per_sample(buffer, rng, hp.batch_size, beta)
            batch, is_w = samp.batch, samp.is_weights
        else:
            batch = replay.sample_uniform(buffer, rng, hp.batch_size)
            is_w = None

        def loss_fn(params):
            return loss_of(params, state.target_params, batch, is_w, r_noise)

        (loss, abs_td), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        step = state.step + 1
        if hp.target_soft_update:
            # tau scaled by n_env, matching reference agent.py:105-110.
            target_params = polyak_update(
                state.target_params, params, hp.target_soft_update_tau * hp.n_env
            )
        else:
            k = max(hp.target_update_freq // hp.n_env, 1)
            target_params = jax.tree_util.tree_map(
                lambda t, o: jnp.where(step % k == 0, o, t),
                state.target_params, params,
            )

        if per:
            buffer = replay.per_update_priorities(
                buffer, samp.leaf_idx, abs_td,
                epsilon=hp.per_epsilon, alpha=hp.per_alpha,
                max_priority=hp.per_max_priority,
            )

        new_state = TrainState(params, target_params, opt_state, step, state.episode_count)
        eps = epsilon_schedule(
            step.astype(jnp.float32), hp.n_env,
            hp.eps_start, hp.eps_min, hp.eps_dec, hp.eps_dec_exp,
        )
        metrics = Metrics(loss=loss, mean_q=jnp.mean(abs_td), epsilon=eps)
        return new_state, buffer, metrics

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(state, buffer, rng):
        return _one_step(state, buffer, rng)

    @functools.partial(jax.jit, static_argnums=(3,), donate_argnums=(0, 1))
    def train_many(state, buffer, rng, k: int):
        """k sequential learner updates fully on device (replay-ratio control)."""

        def body(carry, key):
            st_, buf_ = carry
            st_, buf_, m = _one_step(st_, buf_, key)
            return (st_, buf_), m

        keys = jax.random.split(rng, k)
        (state, buffer), ms = jax.lax.scan(body, (state, buffer), keys)
        last = jax.tree_util.tree_map(lambda x: x[-1], ms)
        return state, buffer, last

    return DQNLearner(
        cfg=cfg,
        net=net,
        init_state=init_state,
        init_buffer=init_buffer,
        select_actions=select_actions,
        greedy_actions=jax.jit(greedy),
        insert=insert,
        train_step=train_step,
        train_many=train_many,
        is_per=per,
        apply_fn=apply_fn,
    )
