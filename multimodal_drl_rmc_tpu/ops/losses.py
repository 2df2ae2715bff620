"""Pure TD-loss functions for the DQN family.

Semantics mirror the reference learners:
  * vanilla TD max target         — dqn/agent.py:166-185 (SimpleAgent.learn)
  * double-DQN target             — dqn/agent.py:204-226 (DoubleAgent.learn)
  * PER IS-weighted loss + |TD|   — dqn/agent.py:245-272 (PerDoubleAgent.learn)
  * SmoothL1 (Huber, beta=1)      — torch.nn.SmoothL1Loss default

All are pure functions of arrays; ``jax.grad`` differentiates through them.
n-step returns extend the reference (HyperParams.n_step == 1 reproduces it).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


def huber(x: jax.Array, delta: float = 1.0) -> jax.Array:
    """Element-wise SmoothL1/Huber: 0.5 x^2 for |x|<delta else delta(|x|-0.5 delta)."""
    abs_x = jnp.abs(x)
    quad = 0.5 * jnp.square(x)
    lin = delta * (abs_x - 0.5 * delta)
    return jnp.where(abs_x < delta, quad, lin)


class Batch(NamedTuple):
    """A sampled transition batch. Shapes: obs [B, D], rest [B]."""

    obs: jax.Array
    action: jax.Array
    reward: jax.Array
    done: jax.Array
    next_obs: jax.Array


def td_targets_max(
    target_q_next: jax.Array, reward: jax.Array, done: jax.Array, gamma: float
) -> jax.Array:
    """Vanilla DQN target: r + (1-d) * gamma * max_a Q_target(s', a)."""
    max_next = jnp.max(target_q_next, axis=-1)
    return reward + (1.0 - done) * gamma * max_next


def td_targets_double(
    online_q_next: jax.Array,
    target_q_next: jax.Array,
    reward: jax.Array,
    done: jax.Array,
    gamma: float,
) -> jax.Array:
    """Double-DQN target: r + (1-d) * gamma * Q_target(s', argmax_a Q_online(s', a))."""
    best = jnp.argmax(online_q_next, axis=-1)
    sel = jnp.take_along_axis(target_q_next, best[:, None], axis=-1)[:, 0]
    return reward + (1.0 - done) * gamma * sel


def q_at_actions(q_values: jax.Array, actions: jax.Array) -> jax.Array:
    return jnp.take_along_axis(q_values, actions[:, None], axis=-1)[:, 0]


def dqn_loss(
    apply_fn,
    params,
    target_params,
    batch: Batch,
    gamma: float,
    *,
    double: bool,
    is_weights: jax.Array | None = None,
    rng: jax.Array | None = None,
):
    """Returns (scalar loss, |TD errors| [B]) for any DQN-family variant.

    ``gamma`` should already be ``gamma ** n_step`` when using n-step returns
    (rewards in the batch are then pre-accumulated n-step returns).

    With ``rng`` set (NoisyNet heads), ``apply_fn`` is (params, x, key) and
    the online and target networks draw INDEPENDENT noise samples
    (Fortunato et al. 2018 §3.1 — the double-DQN argmax shares the online
    sample, riding the fused [s; s'] forward).
    """
    if rng is not None:
        k_target, k_online = jax.random.split(rng)
        fwd_target = lambda p, x: apply_fn(p, x, k_target)
        fwd_online = lambda p, x: apply_fn(p, x, k_online)
    else:
        fwd_target = fwd_online = apply_fn
    target_q_next = fwd_target(target_params, batch.next_obs)
    target_q_next = jax.lax.stop_gradient(target_q_next)
    b = batch.obs.shape[0]
    if double:
        # One online forward over [s; s'] instead of two half-size passes:
        # doubles the MXU row fill at bs=32 and halves kernel dispatches.
        both = fwd_online(params, jnp.concatenate([batch.obs, batch.next_obs], axis=0))
        online_q, online_q_next = both[:b], jax.lax.stop_gradient(both[b:])
        targets = td_targets_double(
            online_q_next, target_q_next, batch.reward, batch.done, gamma
        )
    else:
        online_q = fwd_online(params, batch.obs)
        targets = td_targets_max(target_q_next, batch.reward, batch.done, gamma)

    q = q_at_actions(online_q, batch.action)
    td = targets - q
    per_sample = huber(td)
    if is_weights is not None:
        loss = jnp.mean(is_weights * per_sample)
    else:
        loss = jnp.mean(per_sample)
    return loss, jnp.abs(jax.lax.stop_gradient(td))


def categorical_project(
    probs: jax.Array, reward: jax.Array, done: jax.Array, gamma: float,
    support: jax.Array,
) -> jax.Array:
    """Project the shifted distribution Tz = r + gamma*(1-d)*z back onto the
    fixed support (C51, Bellemare et al. 2017 alg. 1) — vectorized, no
    scatter: for each target atom j its mass splits between the two support
    neighbors of Tz_j, computed as a dense [K_out, K_in] interpolation
    matrix against the support (MXU-friendly batched matmul).

    probs: [B, K] next-state distribution; returns [B, K] projected target.
    """
    k = support.shape[0]
    v_min, v_max = support[0], support[-1]
    dz = (v_max - v_min) / (k - 1)
    tz = reward[:, None] + gamma * (1.0 - done[:, None]) * support[None, :]
    tz = jnp.clip(tz, v_min, v_max)                       # [B, K]
    # weight_ij = max(0, 1 - |tz_j - z_i| / dz): rows are output atoms.
    w = jnp.maximum(0.0, 1.0 - jnp.abs(tz[:, None, :] - support[None, :, None]) / dz)
    return jnp.einsum("bij,bj->bi", w, probs)


def c51_loss(
    logits_fn,
    params,
    target_params,
    batch: Batch,
    gamma: float,
    support: jax.Array,
    *,
    double: bool = True,
    is_weights: jax.Array | None = None,
    rng: jax.Array | None = None,
):
    """Categorical (C51) TD loss: cross-entropy between the projected target
    distribution and the online logits at the taken actions. Returns
    (scalar loss, per-sample CE [B]) — the CE doubles as the PER priority
    signal (Rainbow, Hessel et al. 2018).

    With ``rng`` set (NoisyNet heads), ``logits_fn`` is (params, x, key) and
    the online and target networks draw INDEPENDENT noise samples, matching
    ``dqn_loss``.
    """
    if rng is not None:
        k_target, k_online = jax.random.split(rng)
        fwd_target = lambda p, x: logits_fn(p, x, k_target)
        fwd_online = lambda p, x: logits_fn(p, x, k_online)
    else:
        fwd_target = fwd_online = logits_fn
    b = batch.obs.shape[0]
    target_logits_next = jax.lax.stop_gradient(
        fwd_target(target_params, batch.next_obs))         # [B, A, K]
    target_probs_next = jax.nn.softmax(target_logits_next, axis=-1)

    if double:
        # One online forward over [s; s'] (same fusion as dqn_loss).
        both = fwd_online(
            params, jnp.concatenate([batch.obs, batch.next_obs], axis=0))
        online_logits = both[:b]
        online_logits_next = jax.lax.stop_gradient(both[b:])
        q_next = jnp.sum(jax.nn.softmax(online_logits_next, axis=-1)
                         * support, axis=-1)               # online selection
    else:
        online_logits = fwd_online(params, batch.obs)
        q_next = jnp.sum(target_probs_next * support, axis=-1)
    best = jnp.argmax(q_next, axis=-1)                     # [B]
    probs_best = jnp.take_along_axis(
        target_probs_next, best[:, None, None], axis=1)[:, 0, :]

    target_dist = categorical_project(
        probs_best, batch.reward, batch.done, gamma, support)
    target_dist = jax.lax.stop_gradient(target_dist)

    logits_a = jnp.take_along_axis(
        online_logits, batch.action[:, None, None], axis=1)[:, 0, :]
    log_p = jax.nn.log_softmax(logits_a, axis=-1)
    ce = -jnp.sum(target_dist * log_p, axis=-1)            # [B]
    loss = jnp.mean(is_weights * ce) if is_weights is not None else jnp.mean(ce)
    return loss, jax.lax.stop_gradient(ce)


def _quantile_huber(
    theta: jax.Array, targets: jax.Array, taus: jax.Array,
    is_weights: jax.Array | None, kappa: float,
):
    """Shared pairwise quantile-Huber tail of qr_loss/iqn_loss.

    ``theta`` [B, K_on] online quantiles at the taken actions; ``targets``
    [B, K_tgt] TD target samples; ``taus`` [K_on] (fixed grid, QR) or
    [B, K_on] (sampled per example, IQN). Loss = mean over target samples
    of the sum over online quantiles of the asymmetric Huber
    (Dabney et al. 2017 eq. 10 / 2018 eq. 3).

    Returns (scalar loss, per-sample loss [B]). The PER priority is the
    per-sample quantile-Huber loss itself, NOT mean |u| over all pairs:
    |u| is bounded below by the predicted distribution's spread, which
    would permanently up-weight high-variance states even at zero TD
    error (standard QR-DQN+PER practice uses the loss as the signal).
    """
    u = targets[:, None, :] - theta[:, :, None]       # [B, K_on, K_tgt]
    h = huber(u, kappa)
    t = taus[None, :, None] if taus.ndim == 1 else taus[:, :, None]
    w = jnp.abs(t - (u < 0.0)) / kappa
    per_sample = jnp.mean(jnp.sum(w * h, axis=1), axis=1)          # [B]
    loss = jnp.mean(is_weights * per_sample) if is_weights is not None \
        else jnp.mean(per_sample)
    return loss, jax.lax.stop_gradient(per_sample)


def qr_loss(
    quantiles_fn,
    params,
    target_params,
    batch: Batch,
    gamma: float,
    taus: jax.Array,
    *,
    double: bool = True,
    is_weights: jax.Array | None = None,
    kappa: float = 1.0,
    rng: jax.Array | None = None,
):
    """QR-DQN quantile-Huber loss (Dabney et al. 2017 eq. 10).

    Target quantiles T_j = r + gamma*(1-d)*theta'_j(s', a*) with a* chosen
    by the online network's mean-Q (double) or the target's (vanilla).
    The loss is the mean over target quantiles of the asymmetric Huber
    between every (online quantile i, target quantile j) pair. Returns
    (scalar loss, per-sample mean |TD| [B]) — the PER priority signal.

    With ``rng`` set (NoisyNet heads), ``quantiles_fn`` is (params, x, key)
    and the online and target networks draw INDEPENDENT noise samples,
    matching ``dqn_loss``.
    """
    if rng is not None:
        k_target, k_online = jax.random.split(rng)
        fwd_target = lambda p, x: quantiles_fn(p, x, k_target)
        fwd_online = lambda p, x: quantiles_fn(p, x, k_online)
    else:
        fwd_target = fwd_online = quantiles_fn
    b = batch.obs.shape[0]
    target_q_next = jax.lax.stop_gradient(
        fwd_target(target_params, batch.next_obs))          # [B, A, K]
    if double:
        both = fwd_online(
            params, jnp.concatenate([batch.obs, batch.next_obs], axis=0))
        online_q = both[:b]
        q_next = jnp.mean(jax.lax.stop_gradient(both[b:]), axis=-1)
    else:
        online_q = fwd_online(params, batch.obs)
        q_next = jnp.mean(target_q_next, axis=-1)
    best = jnp.argmax(q_next, axis=-1)                      # [B]
    theta_next = jnp.take_along_axis(
        target_q_next, best[:, None, None], axis=1)[:, 0, :]        # [B, K]
    targets = batch.reward[:, None] \
        + gamma * (1.0 - batch.done[:, None]) * theta_next          # [B, K]
    targets = jax.lax.stop_gradient(targets)

    theta = jnp.take_along_axis(
        online_q, batch.action[:, None, None], axis=1)[:, 0, :]     # [B, K]
    return _quantile_huber(theta, targets, taus, is_weights, kappa)


def iqn_loss(
    quantiles_at_fn,
    params,
    target_params,
    batch: Batch,
    gamma: float,
    rng: jax.Array,
    *,
    n_taus: int,
    double: bool = True,
    is_weights: jax.Array | None = None,
    kappa: float = 1.0,
    noisy: bool = False,
):
    """IQN quantile-Huber loss (Dabney et al. 2018 eq. 3) with SAMPLED
    quantile fractions: fresh taus ~ U(0,1) per call for the online
    network, the target network, and the double-DQN action selection —
    the implicit head evaluates any tau, so every update trains a
    different slice of the return distribution.

    ``quantiles_at_fn(params, x [B, D], taus [B, K]) -> [B, A, K]``.
    ``rng`` is REQUIRED (three independent tau draws). Returns
    (scalar loss, per-sample loss [B]) — the PER priority signal, like
    ``qr_loss``.

    With ``noisy`` (full-Rainbow NoisyIqn), ``quantiles_at_fn`` is
    (params, x, taus, key) and the online and target networks draw
    INDEPENDENT head-noise samples, matching ``qr_loss``'s noisy path.
    """
    b = batch.obs.shape[0]
    k_on, k_tgt, k_sel = jax.random.split(rng, 3)
    if noisy:
        k_on, kn_on = jax.random.split(k_on)
        k_tgt, kn_tgt = jax.random.split(k_tgt)
        fwd_target = lambda p, x, t: quantiles_at_fn(p, x, t, kn_tgt)
        fwd_online = lambda p, x, t: quantiles_at_fn(p, x, t, kn_on)
    else:
        fwd_target = fwd_online = quantiles_at_fn
    taus = jax.random.uniform(k_on, (b, n_taus))          # online, trained
    taus_t = jax.random.uniform(k_tgt, (b, n_taus))       # target quantiles
    target_q_next = jax.lax.stop_gradient(
        fwd_target(target_params, batch.next_obs, taus_t))       # [B, A, K]
    if double:
        # One online forward over [s; s'] (same fusion as qr_loss); the
        # next-state half uses its own tau draw for the mean-Q estimate.
        taus_sel = jax.random.uniform(k_sel, (b, n_taus))
        both = fwd_online(
            params,
            jnp.concatenate([batch.obs, batch.next_obs], axis=0),
            jnp.concatenate([taus, taus_sel], axis=0))
        online_q = both[:b]
        q_next = jnp.mean(jax.lax.stop_gradient(both[b:]), axis=-1)
    else:
        online_q = fwd_online(params, batch.obs, taus)
        q_next = jnp.mean(target_q_next, axis=-1)
    best = jnp.argmax(q_next, axis=-1)                    # [B]
    theta_next = jnp.take_along_axis(
        target_q_next, best[:, None, None], axis=1)[:, 0, :]      # [B, K]
    targets = batch.reward[:, None] \
        + gamma * (1.0 - batch.done[:, None]) * theta_next        # [B, K]
    targets = jax.lax.stop_gradient(targets)

    theta = jnp.take_along_axis(
        online_q, batch.action[:, None, None], axis=1)[:, 0, :]   # [B, K]
    # Asymmetric weights use the SAMPLED online taus (vs qr_loss's fixed
    # midpoint grid) — the defining IQN difference.
    return _quantile_huber(theta, targets, taus, is_weights, kappa)


def polyak_update(target_params, online_params, tau: float):
    """Soft target update (reference agent.py:105-110): t = tau*o + (1-tau)*t."""
    return jax.tree_util.tree_map(
        lambda t, o: tau * o + (1.0 - tau) * t, target_params, online_params
    )


def epsilon_schedule(
    step: jax.Array,
    n_env: int,
    eps_start: float,
    eps_min: float,
    eps_dec: float,
    exp_decay: bool,
) -> jax.Array:
    """Epsilon as a pure function of the agent step (reference agent.py:86-90).

    Interpolates on ``step * n_env`` over [0, eps_dec]; exponential decay
    interpolates in log-space.
    """
    x = jnp.clip(step * n_env, 0.0, eps_dec)
    if exp_decay:
        log_eps = jnp.interp(
            x,
            jnp.asarray([0.0, eps_dec]),
            jnp.asarray([jnp.log(eps_start), jnp.log(eps_min)]),
        )
        return jnp.exp(log_eps)
    return jnp.interp(
        x, jnp.asarray([0.0, eps_dec]), jnp.asarray([eps_start, eps_min])
    )


def beta_schedule(step: jax.Array, beta_start: float, beta_end: float, anneal_steps: float) -> jax.Array:
    """PER importance-sampling beta annealing (reference replay_memory.py:74)."""
    return jnp.interp(
        jnp.asarray(step, jnp.float32),
        jnp.asarray([0.0, anneal_steps]),
        jnp.asarray([beta_start, beta_end]),
    )
