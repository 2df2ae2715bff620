"""Data-parallel learner with capacity-sharded replay over a device mesh.

TPU-native replacement for the reference's single-GPU learner
(dqn/agent.py:51) scaled over ICI: parameters and optimizer state are
replicated, the replay buffer is sharded along its capacity axis (one
disjoint shard per ``dp`` member), each device samples its slice of the
batch locally from its own shard, and gradients are ``pmean``-ed across the
mesh. PER runs as *distributed PER*: each shard owns a local sum tree and
samples/updates locally — the classic Ape-X/distributed-PER decomposition —
so no priority traffic ever crosses chips.

All cross-chip communication is the single gradient pmean (plus metric
means), which XLA lowers to ICI all-reduces.

``make_local_fns`` exposes the per-device bodies so the fused multi-chip
device-sim trainer (sim/distributed.py) composes the same learner shards
with on-device environments sharded over the same mesh.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..agents.dqn import (
    Metrics,
    TrainState,
    make_loss_fn,
    make_tx,
    spec_for_algo,
)
from ..config import Config
from ..models.networks import build_network, greedy_fn, init_params
from ..ops import replay
from ..ops.losses import Batch, beta_schedule, epsilon_schedule, polyak_update


class LocalFns(NamedTuple):
    """Per-device bodies shared by the host DP learner and the fused
    multi-chip device-sim trainer (sim/distributed.py). ``local_train``
    contains the gradient pmean and must run inside shard_map over
    ``axis``; the rest are collective-free."""

    net: Any
    tx: Any
    local_bs: int
    local_cap: int
    per: bool
    obs_size: int
    n_actions: int
    buf_specs: Any
    local_init_buffer: Any   # () -> one replay shard pytree
    local_insert: Any        # (buffer, batch) -> buffer
    local_train: Any         # (state, buffer, rng) -> (state, buffer, Metrics)
    greedy: Any
    select_actions: Any      # (state, obs, rng) -> actions


def make_local_fns(cfg: Config, ndev: int, axis: str = "dp") -> LocalFns:
    hp = cfg.hp
    spec, (double, dueling, per, dist) = spec_for_algo(cfg)

    if hp.batch_size % ndev:
        raise ValueError(f"batch_size {hp.batch_size} not divisible by mesh size {ndev}")
    if hp.max_mem % ndev:
        raise ValueError(f"max_mem {hp.max_mem} not divisible by mesh size {ndev}")
    local_bs = hp.batch_size // ndev
    local_cap = hp.max_mem // ndev

    n_actions = cfg.env.n_actions
    obs_size = cfg.env.obs_size
    net = build_network(spec, n_actions)
    apply_fn = lambda params, x: net.apply(params, x)
    greedy = greedy_fn(net)
    tx = make_tx(hp)
    obs_dtype = jnp.dtype(hp.obs_dtype)
    gamma_n = hp.gamma ** hp.n_step
    loss_of = make_loss_fn(net, apply_fn, spec, gamma_n, double, dist)

    def _buffer_specs():
        """PartitionSpecs for the replay pytree: every array leaf shards on
        its capacity (leading) axis — true of the data arrays and of both
        priority-tree formats (heap node arrays / chunked leaf+chunk
        arrays) — while the scalar ptr/size are identical per shard
        (symmetric inserts) -> replicated."""
        shapes = jax.eval_shape(local_init_buffer)
        return jax.tree_util.tree_map(
            lambda l: P(axis) if l.ndim else P(), shapes)

    def local_init_buffer():
        if per:
            return replay.init_per(local_cap, obs_size, obs_dtype)
        return replay.init(local_cap, obs_size, obs_dtype)

    def local_insert(buffer, batch: Batch):
        if per:
            return replay.per_insert(buffer, batch, hp.per_max_priority)
        return replay.insert(buffer, batch)

    needs_loss_rng = spec.noisy or dist == "iqn"

    def local_train(state: TrainState, buffer, rng: jax.Array):
        my = jax.lax.axis_index(axis)
        rng = jax.random.fold_in(rng, my)
        r_noise = None
        if needs_loss_rng:
            rng, r_noise = jax.random.split(rng)
        if per:
            beta = beta_schedule(
                state.step * hp.n_env, hp.per_beta_start, hp.per_beta_end, hp.eps_dec
            )
            samp = replay.per_sample(buffer, rng, local_bs, beta)
            batch, is_w = samp.batch, samp.is_weights
        else:
            batch = replay.sample_uniform(buffer, rng, local_bs)
            is_w = None

        def loss_fn(params):
            return loss_of(params, state.target_params, batch, is_w, r_noise)

        (loss, abs_td), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        grads = jax.lax.pmean(grads, axis)
        loss = jax.lax.pmean(loss, axis)

        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        step = state.step + 1
        if hp.target_soft_update:
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
        metrics = Metrics(
            loss=loss, mean_q=jax.lax.pmean(jnp.mean(abs_td), axis), epsilon=eps)
        return new_state, buffer, metrics

    if spec.noisy:
        # Scalar dueling heads argmax advantages (reference parity);
        # distributional heads argmax expected Q (__call__).
        noisy_greedy_method = None if spec.n_atoms > 1 else "advantages"

        def select_actions(state: TrainState, obs: jax.Array,
                           rng: jax.Array) -> jax.Array:
            # NoisyNet: greedy under one sampled noise draw per call (the
            # caller already folds in the device index, so shards explore
            # with independent noise).
            q = net.apply(state.params, obs, method=noisy_greedy_method,
                          rngs={"noise": rng})
            return jnp.argmax(q, axis=-1)
    else:
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

    return LocalFns(
        net=net, tx=tx, local_bs=local_bs, local_cap=local_cap, per=per,
        obs_size=obs_size, n_actions=n_actions,
        buf_specs=_buffer_specs(), local_init_buffer=local_init_buffer,
        local_insert=local_insert, local_train=local_train,
        greedy=greedy, select_actions=select_actions,
    )


class DPLearner(NamedTuple):
    cfg: Config
    mesh: Mesh
    net: Any
    init_state: Any     # (rng) -> TrainState (replicated)
    init_buffer: Any    # () -> sharded replay pytree
    insert: Any         # (buffer, batch[B,...]) -> buffer   (B divisible by ndev)
    train_step: Any     # (state, buffer, rng) -> (state, buffer, Metrics)
    select_actions: Any
    is_per: bool


def init_sharded_buffer(fns: LocalFns, mesh: Mesh, axis: str = "dp"):
    """Globally-sharded replay allocation: ndev independent local shards."""
    ndev = mesh.shape[axis]
    shards = jax.eval_shape(fns.local_init_buffer)

    def alloc(shape_dtype, spec_leaf):
        shape = list(shape_dtype.shape)
        if spec_leaf == P(axis):
            shape[0] *= ndev
        return jax.device_put(
            jnp.zeros(shape, shape_dtype.dtype), NamedSharding(mesh, spec_leaf)
        )

    buf = jax.tree_util.tree_map(alloc, shards, fns.buf_specs)
    if fns.per:
        # The zeros-allocation above is wrong for the min reduction (empty
        # slots must read +inf) — re-seed it for whichever tree format the
        # buffer uses.
        field = "chunk_min" if hasattr(buf.tree, "chunk_min") else "min_tree"
        inf = jnp.full(getattr(buf.tree, field).shape, jnp.inf, jnp.float32)
        buf = buf._replace(
            tree=buf.tree._replace(
                **{field: jax.device_put(inf, NamedSharding(mesh, P(axis)))})
        )
    return buf


def make_dp_learner(cfg: Config, mesh: Mesh, axis: str = "dp") -> DPLearner:
    ndev = mesh.shape[axis]
    fns = make_local_fns(cfg, ndev, axis)
    rep = NamedSharding(mesh, P())

    def init_state(rng: jax.Array) -> TrainState:
        params = init_params(fns.net, fns.obs_size, rng)
        state = TrainState(
            params=params,
            target_params=jax.tree_util.tree_map(jnp.copy, params),
            opt_state=fns.tx.init(params),
            step=jnp.zeros((), jnp.int32),
            episode_count=jnp.zeros((), jnp.int32),
        )
        return jax.device_put(state, rep)

    insert_sm = jax.jit(
        jax.shard_map(
            fns.local_insert,
            mesh=mesh,
            in_specs=(fns.buf_specs, Batch(P(axis), P(axis), P(axis), P(axis), P(axis))),
            out_specs=fns.buf_specs,
        ),
        donate_argnums=(0,),
    )

    state_specs = TrainState(P(), P(), P(), P(), P())
    train_sm = jax.jit(
        jax.shard_map(
            fns.local_train,
            mesh=mesh,
            in_specs=(state_specs, fns.buf_specs, P()),
            out_specs=(state_specs, fns.buf_specs, Metrics(P(), P(), P())),
            check_vma=False,
        ),
        donate_argnums=(0, 1),
    )

    return DPLearner(
        cfg=cfg,
        mesh=mesh,
        net=fns.net,
        init_state=init_state,
        init_buffer=lambda: init_sharded_buffer(fns, mesh, axis),
        insert=insert_sm,
        train_step=train_sm,
        select_actions=jax.jit(fns.select_actions),
        is_per=fns.per,
    )
