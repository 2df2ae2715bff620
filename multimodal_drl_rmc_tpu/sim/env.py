"""Cycle-level batched device env: the on-TPU RampMeterEnv.

Reproduces the host MDP semantics (envs/rl_controller.py — 40 s green/red
cycle, 14-feature macro state, CV grid, weighted reward) as pure jitted
functions over ``SimState``, vmapped over a batch of environments. The
entire agent step (40 simulated seconds of traffic) is one XLA computation;
``train_on_device.py`` fuses it with the learner.

Divergence notes vs the host path (documented, intentional):
  * grid cells take the max-speed vehicle instead of dict-iteration-order
    'first' (sumo_env.py:299-301) — same information, deterministic;
  * detector interval == the control cycle exactly (the host/TraCI path
    inherits SUMO's absolute-time 40 s detector windows, which lag the
    cycle by the 5 s warm-up offset).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import EnvConfig
from .core import GREEN, RED, SimState, clear_cycle_accumulators, reset, step_1s
from .geometry import GEO, SLOTS


def _idx(names):
    """Loop group as (chain, slot) static index arrays into the [C, K]
    detector tables (geometry.py loop_slot)."""
    pairs = [GEO.loop_slot[n] for n in names]
    return (jnp.asarray([c for c, _ in pairs], jnp.int32),
            jnp.asarray([k for _, k in pairs], jnp.int32))


UP_LOOPS = _idx(["up_stream_sens_0", "up_stream_sens_1", "up_stream_sens_2"])
BN_LOOPS = _idx(["bottle_neck_sens_0", "bottle_neck_sens_1",
                 "bottle_neck_sens_2", "bottle_neck_sens_3"])
# outflow_sens_0 is split across the mainline chain and the merged ramp
# stream (geometry.py); fold the mirror into the group for flows/speeds.
DS_LOOPS = _idx(["outflow_sens_0", "outflow_sens_1", "outflow_sens_2",
                 "outflow_sens_0@ramp"])
DS_N_LANES = 3


def _sub(pair, sl):
    return (pair[0][sl], pair[1][sl])


class CycleMetrics(NamedTuple):
    flow_upstream_vph: jax.Array
    flow_merging_vph: jax.Array
    flow_downstream_vph: jax.Array
    occ_upstream: jax.Array
    occ_bottleneck: jax.Array
    occ_downstream: jax.Array
    speed_upstream: jax.Array
    speed_bottleneck: jax.Array
    speed_downstream: jax.Array
    ramp_queue_veh: jax.Array
    flow_lane0_merging_vph: jax.Array
    occ_lane0_bottleneck: jax.Array
    speed_lane0_bottleneck: jax.Array
    flow_lane0_upstream_vph: jax.Array
    occ_lane0_upstream: jax.Array
    speed_lane0_upstream: jax.Array


def _group_metrics(state: SimState, loops, interval: jax.Array,
                   n_lanes: int | None = None):
    c, k = loops
    counts = state.loop_count[c, k]
    flow_vph = counts.sum() * 3600.0 / jnp.maximum(interval, 1.0)
    occ_pct = 100.0 * state.loop_occ_time[c, k] / jnp.maximum(interval, 1.0)
    n = n_lanes if n_lanes is not None else c.shape[0]
    occ = occ_pct.sum() / n
    sc = state.loop_step_count[c, k]
    step_speed = state.loop_step_speed[c, k]
    ss = jnp.where(step_speed >= 0, step_speed, 0.0)
    total_flow = sc.sum()
    speed = jnp.where(total_flow > 0, (sc * ss).sum() / jnp.maximum(total_flow, 1.0), 0.0)
    return flow_vph, occ, speed


def cycle_metrics(state: SimState, cycle_seconds: float) -> CycleMetrics:
    interval = jnp.asarray(cycle_seconds, jnp.float32)
    f_up, o_up, s_up = _group_metrics(state, UP_LOOPS, interval)
    f_bn, o_bn, s_bn = _group_metrics(state, BN_LOOPS, interval)
    f_ds, o_ds, s_ds = _group_metrics(state, DS_LOOPS, interval, DS_N_LANES)
    f_l0b, o_l0b, s_l0b = _group_metrics(state, _sub(BN_LOOPS, slice(0, 1)), interval)
    # 'lane 0 upstream' reads upstream loop index 1 — the reference's quirk
    # (rl_controller.py:149-151), kept for state-vector parity.
    f_l0u, o_l0u, s_l0u = _group_metrics(state, _sub(UP_LOOPS, slice(1, 2)), interval)
    return CycleMetrics(
        flow_upstream_vph=f_up, flow_merging_vph=f_bn, flow_downstream_vph=f_ds,
        occ_upstream=o_up, occ_bottleneck=o_bn, occ_downstream=o_ds,
        speed_upstream=s_up, speed_bottleneck=s_bn, speed_downstream=s_ds,
        ramp_queue_veh=state.sum_queue / jnp.maximum(interval, 1.0),
        flow_lane0_merging_vph=f_l0b, occ_lane0_bottleneck=o_l0b,
        speed_lane0_bottleneck=s_l0b, flow_lane0_upstream_vph=f_l0u,
        occ_lane0_upstream=o_l0u, speed_lane0_upstream=s_l0u,
    )


def _norm(x, denom):
    return jnp.clip(x / jnp.maximum(denom, 1e-6), 0.0, 1.0)


def macro_state(m: CycleMetrics, last_action_sec: jax.Array, cfg: EnvConfig) -> jax.Array:
    base = [
        _norm(m.flow_upstream_vph, cfg.max_flow_upstream_vph),
        _norm(m.flow_merging_vph, cfg.max_flow_merging_vph),
        _norm(m.occ_upstream, cfg.max_occupancy_percent),
        _norm(m.speed_upstream, cfg.freeflow_speed_mps),
        _norm(m.occ_bottleneck, cfg.max_occupancy_percent),
        _norm(m.speed_bottleneck, cfg.freeflow_speed_mps),
        _norm(m.ramp_queue_veh, cfg.max_ramp_queue_veh),
    ]
    if cfg.obs_variant == "macro_no_lane":
        feats = base + [_norm(last_action_sec, cfg.cycle_seconds)]
    else:
        feats = base + [
            _norm(m.flow_lane0_merging_vph, cfg.max_lane_flow_vph),
            _norm(m.flow_lane0_upstream_vph, cfg.max_lane_flow_vph),
            _norm(m.occ_lane0_bottleneck, cfg.max_occupancy_percent),
            _norm(m.speed_lane0_bottleneck, cfg.freeflow_speed_mps),
            _norm(m.occ_lane0_upstream, cfg.max_occupancy_percent),
            _norm(m.speed_lane0_upstream, cfg.freeflow_speed_mps),
            _norm(last_action_sec, cfg.cycle_seconds),
        ]
    return jnp.stack(feats)


# Chain -> grid column (envs/grid.py COLUMN_MAP): main lanes 0/1/2 map to
# cols 2/1/0; the ramp chain maps to col 4 upstream of the accel area and
# col 3 inside it; chain 4 (off-ramp) is outside the grid.
_GRID_START = jnp.asarray(GEO.grid_start)


def grid_state(state: SimState, cfg: EnvConfig) -> jax.Array:
    g = cfg.grid
    pos = state.pos[:4].reshape(-1)
    speed = state.speed[:4].reshape(-1)
    valid = (state.active[:4] & state.connected[:4]).reshape(-1)
    chain = jnp.repeat(jnp.arange(4), SLOTS)

    dist = pos - _GRID_START[chain]
    valid = valid & (dist >= 0.0) & (dist <= g.total_length_m)
    row = jnp.clip(((g.total_length_m - dist) / g.cell_length_m).astype(jnp.int32),
                   0, g.rows - 1)
    col_main = jnp.asarray([2, 1, 0, 3], jnp.int32)[chain]
    on_approach = (chain == 3) & (pos < GEO.ramp_accel_start)
    col = jnp.where(on_approach, 4, col_main)

    norm_speed = jnp.clip(speed / cfg.freeflow_speed_mps, 0.0, 1.0)
    row = jnp.where(valid, row, 0)
    col = jnp.where(valid, col, 0)
    occ = jnp.zeros((g.rows, g.cols), jnp.float32).at[row, col].max(
        valid.astype(jnp.float32))
    spd = jnp.zeros((g.rows, g.cols), jnp.float32).at[row, col].max(
        jnp.where(valid, norm_speed, 0.0))
    return jnp.stack([spd, occ], axis=-1)  # [rows, cols, 2] (HWC like host)


def observation(state: SimState, last_action_sec: jax.Array, cfg: EnvConfig) -> jax.Array:
    m = cycle_metrics(state, cfg.cycle_seconds)
    macro = macro_state(m, last_action_sec, cfg)
    if cfg.obs_variant != "hybrid":
        return macro
    return jnp.concatenate([macro, grid_state(state, cfg).reshape(-1)])


def reward(m: CycleMetrics, cfg: EnvConfig) -> jax.Array:
    """Reference reward (rl_controller.py:388-425) in jnp."""
    r_speed_merge = _norm(m.speed_bottleneck, cfg.freeflow_speed_mps)
    r_speed_up = _norm(m.speed_upstream, cfg.freeflow_speed_mps)
    r_speed_down = _norm(m.speed_downstream, cfg.freeflow_speed_mps)
    p_occ_bottle = -_norm(m.occ_bottleneck, cfg.max_occupancy_percent)
    p_occ_up = -_norm(m.occ_upstream, cfg.max_occupancy_percent)
    p_queue = -_norm(m.ramp_queue_veh, cfg.max_ramp_queue_veh)
    threshold = cfg.spillback_threshold_frac * cfg.max_ramp_queue_veh
    denom = jnp.maximum(cfg.max_ramp_queue_veh - threshold, 1e-6)
    p_spill = -jnp.clip((m.ramp_queue_veh - threshold) / denom, 0.0, 1.0)
    return (cfg.w_speed_merge * r_speed_merge
            + cfg.w_speed_up * r_speed_up
            + cfg.w_speed_down * r_speed_down
            + cfg.w_occ_bottle * p_occ_bottle
            + cfg.w_occ_upstream * p_occ_up
            + cfg.w_queue * p_queue
            + cfg.w_spillback * p_spill)


class EnvState(NamedTuple):
    sim: SimState
    last_action_sec: jax.Array  # [] f32


def make_env_fns(cfg: EnvConfig):
    """Single-env pure functions (reset_one, obs_one, step_one,
    step_green_one).

    ``step_one`` simulates one full control cycle and auto-resets at
    episode end; it is vmapped by DeviceRampEnv and shard_mapped by the
    multi-chip trainer (sim/distributed.py).
    """
    actions_sec = jnp.asarray(cfg.green_time_actions_sec, jnp.float32)
    cyc = int(cfg.cycle_seconds)
    episode_s = cfg.scenario.episode_seconds
    scen = cfg.scenario
    sigma = float(getattr(scen, "accel_noise_sigma", 0.0))

    def reset_one(rng: jax.Array) -> EnvState:
        return EnvState(reset(rng, scen), actions_sec[0])

    def obs_one(es: EnvState) -> jax.Array:
        return observation(es.sim, es.last_action_sec, cfg)

    def step_one(es: EnvState, action: jax.Array):
        return step_green_one(
            es, actions_sec[jnp.clip(action, 0, len(actions_sec) - 1)])

    def step_green_one(es: EnvState, green: jax.Array):
        """Cycle step with a CONTINUOUS green time (seconds) instead of a
        discrete action index — the classical controllers (ALINEA's
        rate->green law) need greens outside the 8-action grid
        (sim/eval_on_device.py device-protocol baselines)."""
        sim = clear_cycle_accumulators(es.sim)

        def body(s, i):
            s = s._replace(phase=jnp.where(i < green, GREEN, RED).astype(jnp.int32))
            return step_1s(s, sigma), None

        sim, _ = jax.lax.scan(body, sim, jnp.arange(cyc, dtype=jnp.float32))
        m = cycle_metrics(sim, cfg.cycle_seconds)
        rew = reward(m, cfg)
        done = sim.t >= episode_s
        es_next = EnvState(sim, green)
        obs = observation(sim, green, cfg)

        # Auto-reset on episode end (fresh demand draw from the env rng).
        rng_next = jax.random.fold_in(sim.rng, 1)
        fresh = reset_one(rng_next)
        es_out = jax.tree_util.tree_map(
            lambda a, b: jnp.where(
                jnp.reshape(done, (1,) * a.ndim) if a.ndim else done, b, a
            ), es_next, fresh)
        obs_out = jnp.where(done, obs_one(fresh), obs)
        return es_out, (obs, obs_out, rew, done, m)

    return reset_one, obs_one, step_one, step_green_one


def make_batched_step(cfg: EnvConfig, interpret: bool | None = None,
                      block: int | None = None):
    """Whole-batch control-cycle step using the BT>1 kernel path.

    Equivalent to ``jax.vmap(step_one)`` but the 1 s inner loop calls
    ``core.step_1s_batched`` — the full batch enters ``fused_step_full``
    as (8-env) kernel blocks instead of B separate one-env grid programs,
    filling the VPU's 8-sublane tiles. Everything around the kernel
    (metrics, reward, auto-reset) is the vmapped single-env code.
    """
    from .core import step_1s_batched

    if interpret is None:
        # Auto: compiled kernel on TPU, interpret mode on CPU (tests /
        # forced MDRLRMC_BATCHED=1 without a real chip).
        interpret = jax.default_backend() == "cpu"
    reset_one, obs_one, step_one, _ = make_env_fns(cfg)
    actions_sec = jnp.asarray(cfg.green_time_actions_sec, jnp.float32)
    cyc = int(cfg.cycle_seconds)
    episode_s = cfg.scenario.episode_seconds
    sigma = float(getattr(cfg.scenario, "accel_noise_sigma", 0.0))

    def step_batched(es: EnvState, actions: jax.Array):
        green = actions_sec[jnp.clip(actions, 0, len(actions_sec) - 1)]  # [B]
        return step_green_batched(es, green)

    def step_green_batched(es: EnvState, green: jax.Array):
        sim = jax.vmap(clear_cycle_accumulators)(es.sim)

        def body(s, i):
            phase = jnp.where(i < green, GREEN, RED).astype(jnp.int32)
            return step_1s_batched(s._replace(phase=phase), interpret,
                                   block, sigma), None

        sim, _ = jax.lax.scan(body, sim, jnp.arange(cyc, dtype=jnp.float32))
        m = jax.vmap(lambda s: cycle_metrics(s, cfg.cycle_seconds))(sim)
        rew = jax.vmap(lambda mm: reward(mm, cfg))(m)
        done = sim.t >= episode_s                                        # [B]
        obs = jax.vmap(lambda s, g: observation(s, g, cfg))(sim, green)

        rng_next = jax.vmap(lambda k: jax.random.fold_in(k, 1))(sim.rng)
        fresh = jax.vmap(reset_one)(rng_next)
        es_next = EnvState(sim, green)

        def pick(a, b):
            d = done.reshape(done.shape + (1,) * (a.ndim - 1))
            return jnp.where(d, b, a)

        es_out = jax.tree_util.tree_map(pick, es_next, fresh)
        obs_out = jnp.where(done[:, None], jax.vmap(obs_one)(fresh), obs)
        return es_out, (obs, obs_out, rew, done, m)

    return step_batched, step_green_batched


class DeviceRampEnv:
    """Batched on-device env: ``reset(rng)`` / ``step(state, actions)``.

    All methods are jitted and operate on a batch dimension B. One
    ``step`` simulates ``cycle_seconds`` of traffic per env.
    """

    def __init__(self, cfg: EnvConfig, batch: int,
                 batched_kernel: bool | None = None):
        """``batched_kernel`` routes the 1 s inner loop through the BT>1
        kernel path (make_batched_step) instead of vmapping the single-env
        step: 99.4 -> 75.7 ms per 40 s cycle at B=256 on v5e (the batch
        enters the kernel as 8-env blocks, filling the 8-sublane tiles).
        Default: on when the Pallas path is active (real TPU), off on CPU;
        MDRLRMC_BATCHED=0/1 overrides."""
        self.cfg = cfg
        self.batch = batch
        self.actions_sec = jnp.asarray(cfg.green_time_actions_sec, jnp.float32)
        reset_one, obs_one, step_one, step_green_one = make_env_fns(cfg)
        if batched_kernel is None:
            import os

            env_v = os.environ.get("MDRLRMC_BATCHED")
            if env_v is not None:
                batched_kernel = env_v not in ("0", "", "false")
            else:
                from .core import use_pallas_substeps

                batched_kernel = use_pallas_substeps()
        self._reset = jax.jit(jax.vmap(reset_one))
        self._obs = jax.jit(jax.vmap(obs_one))
        if batched_kernel:
            step_b, step_g = make_batched_step(cfg)
            self._step, self._step_green = jax.jit(step_b), jax.jit(step_g)
        else:
            self._step = jax.jit(jax.vmap(step_one))
            self._step_green = jax.jit(jax.vmap(step_green_one))

    def reset(self, rng: jax.Array):
        states = self._reset(jax.random.split(rng, self.batch))
        return states, self._obs(states)

    def step(self, states: EnvState, actions: jax.Array):
        """Returns (new_states, (obs_final, obs_next, reward, done, metrics)).

        ``obs_final`` is the end-of-cycle observation (the transition's
        s'); ``obs_next`` is the post-auto-reset observation to act on.
        """
        return self._step(states, actions)

    def step_green(self, states: EnvState, green_sec: jax.Array):
        """Cycle step with continuous green times [B] in seconds (the
        classical-controller eval path; see ``step`` for the returns)."""
        return self._step_green(states, green_sec)

    @property
    def obs_size(self) -> int:
        return self.cfg.obs_size

    @property
    def n_actions(self) -> int:
        return self.cfg.n_actions
