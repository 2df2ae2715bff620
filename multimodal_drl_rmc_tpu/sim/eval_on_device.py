"""Massively parallel policy evaluation on the device simulator.

The reference evaluates one episode at a time through SUMO (~4 min of
wall-clock per 3600 s episode, evaluate.py:24-106 + sumo_env.py run loop);
our host-protocol twin (runtime/evaluate.py --backend native) does the same
through the C++ sim at ~25 s/episode on the single shared core. Round 3's
empirical program was bottlenecked by exactly that: every snapshot sweep is
17 packs x 50 episodes of serial host sim, hours behind the trainer.

This module runs the SAME greedy-policy rollout on the on-device JAX sim
as ONE XLA program vmapped over snapshots x episodes: S stacked parameter
trees act on S*E environments stepped as one batch through the fused
Pallas cycle kernel (the episode axis is padded so S*E is always a
multiple of the 8-env kernel tile; pad episodes are dropped from the
rows). 17 snapshots x 50 episodes is 952 concurrent envs (850 + 102
pad) — about two minutes on a v5e instead of ~6 hours on the host core. That
turns snapshot screening and large-N tail estimation (1000-episode
CVaR of a production pick) into interactive operations the reference
cannot express at all.

Protocol notes (device protocol, NOT the host table protocol):
* Same simulator family as training (sim/core.py); detector interval ==
  control cycle (documented difference vs SUMO's absolute 40 s windows,
  sim/env.py); emissions are the wheel-power proxy (sim/physics.py), not
  HBEFA. Numbers are directly comparable across policies/snapshots under
  this protocol, and tables must say backend=device.
* Episodes are paired across snapshots: episode e uses the same demand
  draw (same reset key) for every pack, so cross-snapshot deltas are
  paired like the host harness's common-seed episodes (evaluate.py
  seed=master+i).
* Rows carry the host CSV schema (evaluation/parsers.py merged-row
  columns) with NaN for the four per-trip-distribution columns the
  aggregate trip counters cannot produce (medians/stds/sum-of-squares).

Use scripts/eval_snapshots_device.py for the sweep CLI.
"""

from __future__ import annotations

import os
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .. import guard
from ..config import Config, EnvConfig
from ..models import packio
from ..models.networks import DuelingQNetwork, build_network
from .core import default_block
from .env import DeviceRampEnv
from .physics import CO2_PER_FUEL_ML

# Chains 0-2 are the Mainline route, 3 On-Ramp, 4 Off-Ramp (sim/core.py
# SimState trip-statistics docstring).
ROUTE_CHAINS = {"Mainline": (0, 1, 2), "On-Ramp": (3,), "Off-Ramp": (4,)}

# Host merged-row columns we cannot compute from aggregate counters (the
# device sim keeps per-route sums, not per-trip distributions).
_NAN_COLS = ("median_travel_time", "std_dev_travel_time",
             "median_time_loss", "std_dev_time_loss",
             "sum_of_squared_time_loss")


# ---------------------------------------------------------------------------
# Classical controllers on the device protocol
# ---------------------------------------------------------------------------
#
# Pure scan-compatible twins of envs/baselines.py (reference
# env/custom_env/baselines.py:80-253): carry -> (carry, green_seconds[B]).
# Differences forced by the device protocol, both documented there: control
# is per 40 s cycle (green-then-red within the cycle — FixedCycle's 20/20
# and AlwaysGreen's always-on map exactly), and ALINEA's occupancy
# measurement is the previous cycle's merge-area loop occupancy
# (detector interval == control cycle, sim/env.py).


def _alinea_green(rate_vph, cfg_env):
    cyc = cfg_env.cycle_seconds
    veh_per_cycle = rate_vph * (cyc / 3600.0)
    return jnp.clip(veh_per_cycle / 0.5, 3.0, cyc)   # sat flow 0.5 veh/s


def _make_controller(strategy: str, cfg_env, B: int):
    """(init_carry, step(carry, occ_merge_prev[B]) -> (carry, green[B]))."""
    cyc = float(cfg_env.cycle_seconds)
    if strategy == "AlwaysGreenBaseline":
        return (), lambda c, occ: (c, jnp.full((B,), cyc, jnp.float32))
    if strategy == "FixedCycleBaseline":
        return (), lambda c, occ: (c, jnp.full((B,), 20.0, jnp.float32))
    if strategy == "AlineaDsBaseline":
        init = jnp.full((B,), (180.0 + 1900.0) / 2, jnp.float32)

        def step(rate, occ):
            rate = jnp.clip(rate + 60.0 * (17.0 - occ), 180.0, 1900.0)
            return rate, _alinea_green(rate, cfg_env)

        return init, step
    if strategy == "PiAlineaDsBaseline":
        init = (jnp.full((B,), (180.0 + 1900.0) / 2, jnp.float32),
                jnp.zeros((B,), jnp.float32))

        def step(carry, occ):
            rate, integral = carry
            err = 17.0 - occ
            integral_new = integral + err
            new_rate = rate + 60.0 * err + 10.0 * integral_new
            # Conditional anti-windup (baselines.py:258-267): the rate is
            # clipped from the incremented-integral value either way; only
            # the integral is backed out when the actuator saturates.
            saturated = (new_rate > 1800.0) | (new_rate < 180.0)
            integral = jnp.where(saturated, integral, integral_new)
            rate = jnp.clip(new_rate, 180.0, 1800.0)
            return (rate, integral), _alinea_green(rate, cfg_env)

        return init, step
    raise ValueError(f"unknown device-protocol strategy {strategy!r}")


def _greedy_for(net):
    """greedy_fn's XLA path (models/networks.py:414-442) — replicated here
    because the Pallas dueling kernel is not written for an extra vmap
    axis (we vmap over the snapshot axis)."""
    if isinstance(net, DuelingQNetwork):
        return lambda p, x: jnp.argmax(
            net.apply(p, x, method=net.advantages), axis=-1)
    return lambda p, x: jnp.argmax(net.apply(p, x), axis=-1)


class DeviceEvaluator:
    """Greedy-policy eval of S parameter sets x E episodes in one program.

    All packs of one ``evaluate()`` call must share a NetworkSpec (a
    snapshot sweep does); the rollout jit is cached per (S, E) shape so a
    sweep over many same-shape groups compiles once.
    """

    def __init__(self, cfg: Config | None = None, n_episodes: int = 50,
                 master_seed: int = 42, cycles: int | None = None,
                 guard_occ: float = 0.0, guard_cap: int = 3):
        self.base_cfg = cfg or Config()
        self.E = int(n_episodes)
        self.master_seed = int(master_seed)
        # Safety envelope, mirroring runtime/rollout.py PolicyRunner: while
        # the PREVIOUS cycle's merge occupancy exceeds guard_occ percent,
        # cap actions at guard_cap (0.0 = off; BENCHMARKS "safety
        # envelope").
        self.guard_occ = float(guard_occ)
        self.guard_cap = int(guard_cap)
        env_cfg = self.base_cfg.env
        self.cycles = int(cycles if cycles is not None
                          else env_cfg.scenario.episode_seconds
                          // env_cfg.cycle_seconds)
        # Raise the episode horizon one full cycle past the rollout so the
        # env's auto-reset (sim/env.py step_one) never fires and the final
        # carry still holds the episode's cumulative trip statistics.
        # (One cycle, not +1 s: reset() starts the sim clock at t=5 s, so
        # the rollout's final t is cycles*cycle_seconds + 5.)
        scen = type(env_cfg.scenario)(**{
            **env_cfg.scenario.__dict__,
            "episode_seconds": (self.cycles + 1) * env_cfg.cycle_seconds})
        self.env_cfg = EnvConfig(**{**env_cfg.__dict__, "scenario": scen})
        self._envs: dict[int, DeviceRampEnv] = {}
        self._rollouts: dict = {}

    # -- core rollout --------------------------------------------------------

    def _padded_E(self, S: int) -> int:
        """Episode count padded so S*E is a multiple of the env-tile size.

        The fused cycle kernel tiles the batch in blocks of
        ``default_block()`` (8) envs and Mosaic requires the tile to be a
        multiple of 8 on the sublane axis — a 17-snapshot x 50-episode
        sweep (850 envs) has no such tiling. Extra episodes are rolled
        with their own reset keys and dropped in ``_rows``; the REAL
        episodes' keys are unchanged by padding (protocol-stable)."""
        blk = default_block()
        E = self.E
        while (S * E) % blk:
            E += 1
        return E

    def _rollout_fn(self, net, S: int):
        key = (id(type(net)), net.spec, S, self.guard_occ, self.guard_cap)
        if key in self._rollouts:
            return self._rollouts[key]
        E = self._padded_E(S)
        if S * E not in self._envs:
            self._envs[S * E] = DeviceRampEnv(self.env_cfg, S * E)
        env = self._envs[S * E]
        greedy = _greedy_for(net)
        guard_occ, guard_cap = self.guard_occ, self.guard_cap

        def rollout(params_stacked, reset_keys):
            states = env._reset(reset_keys)
            obs = env._obs(states)
            occ_prev = jnp.zeros((S * E,), jnp.float32)

            def body(carry, _):
                states, obs, occ_prev = carry
                acts = jax.vmap(greedy)(
                    params_stacked, obs.reshape(S, E, -1)).reshape(S * E)
                acts = guard.clamp(acts, occ_prev, guard_occ, guard_cap)
                states, (_of, obs_next, rew, _done, m) = env.step(states, acts)
                series = (m.ramp_queue_veh,
                          m.flow_upstream_vph, m.occ_upstream,
                          m.speed_upstream,
                          m.flow_merging_vph, m.occ_bottleneck,
                          m.speed_bottleneck,
                          m.flow_downstream_vph, m.occ_downstream,
                          m.speed_downstream)
                return (states, obs_next, m.occ_bottleneck), series

            (states, _, _), series = jax.lax.scan(
                body, (states, obs, occ_prev), None, length=self.cycles)
            return states, series

        fn = jax.jit(rollout)
        self._rollouts[key] = fn
        return fn

    def _reset_keys(self, S: int) -> jax.Array:
        keys = jax.random.split(jax.random.PRNGKey(self.master_seed), self.E)
        Epad = self._padded_E(S)
        if Epad > self.E:                      # tile-alignment padding only;
            extra = jax.random.split(          # real keys stay unchanged
                jax.random.fold_in(jax.random.PRNGKey(self.master_seed), 1),
                Epad - self.E)
            keys = jnp.concatenate([keys, extra])
        return jnp.tile(keys, (S, 1))          # episode e paired across S

    # -- public API ----------------------------------------------------------

    def evaluate(self, pack_paths: Sequence[str],
                 obs_variant: str = "hybrid") -> list[dict]:
        """Evaluate packs (same NetworkSpec) over E paired episodes.

        Returns one host-schema row dict per (pack, episode), tagged with
        ``model_path``.
        """
        from ..runtime.rollout import infer_spec_for_pack

        n_actions = self.base_cfg.env.n_actions
        specs = [infer_spec_for_pack(p, obs_variant, n_actions)
                 for p in pack_paths]
        if len(set(specs)) != 1:
            raise ValueError(
                f"packs mix NetworkSpecs — evaluate() stacks parameters, "
                f"group by spec first: {sorted(set(map(str, specs)))}")
        net = build_network(specs[0], n_actions)
        params = [packio.load_pack(p, specs[0], specs[0].dueling)[0]
                  for p in pack_paths]
        stacked = jax.tree_util.tree_map(
            lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *params)
        S = len(pack_paths)
        states, series = self._rollout_fn(net, S)(stacked,
                                                  self._reset_keys(S))
        return self._rows(pack_paths, states, series)

    def evaluate_strategy(self, strategy: str) -> list[dict]:
        """Classical-controller eval on the device protocol: E paired
        episodes of AlwaysGreen / FixedCycle / ALINEA / PI-ALINEA (same
        reset keys as ``evaluate``, so rows pair episode-for-episode with
        any pack's device rows). Uses the continuous-green step
        (sim/env.py step_green) — ALINEA's rate law is not confined to
        the agents' 8-action grid."""
        E = self._padded_E(1)
        if E not in self._envs:
            self._envs[E] = DeviceRampEnv(self.env_cfg, E)
        env = self._envs[E]
        key = ("strategy", strategy, 1)
        if key not in self._rollouts:
            init, ctrl = _make_controller(strategy, self.base_cfg.env, E)

            def rollout(reset_keys):
                states = env._reset(reset_keys)

                def body(carry, _):
                    states, ctrl_state, occ = carry
                    ctrl_state, green = ctrl(ctrl_state, occ)
                    states, (_of, _obs, _rew, _done, m) = env.step_green(
                        states, green)
                    series = (m.ramp_queue_veh,
                              m.flow_upstream_vph, m.occ_upstream,
                              m.speed_upstream,
                              m.flow_merging_vph, m.occ_bottleneck,
                              m.speed_bottleneck,
                              m.flow_downstream_vph, m.occ_downstream,
                              m.speed_downstream)
                    return (states, ctrl_state, m.occ_bottleneck), series

                (states, _, _), series = jax.lax.scan(
                    body, (states, init, jnp.zeros((E,), jnp.float32)),
                    None, length=self.cycles)
                return states, series

            self._rollouts[key] = jax.jit(rollout)
        states, series = self._rollouts[key](self._reset_keys(1))
        return self._rows([strategy], states, series)

    # -- row construction ----------------------------------------------------

    def _rows(self, pack_paths, states, series) -> list[dict]:
        S, E = len(pack_paths), self.E
        Epad = self._padded_E(S)
        sim = jax.device_get(states.sim)
        (queue, f_up, o_up, s_up, f_mg, o_bn, s_bn,
         f_dn, o_dn, s_dn) = (np.asarray(x).reshape(self.cycles, S, Epad)
                              for x in series)
        cyc_s = self.base_cfg.env.cycle_seconds
        spill_thr = (self.base_cfg.env.spillback_threshold_frac
                     * self.base_cfg.env.max_ramp_queue_veh)

        def r2(x):
            return x.reshape(S, Epad, *x.shape[1:])

        arrived, travel, loss, waited = (r2(np.asarray(sim.arrived)),
                                         r2(np.asarray(sim.travel_sum)),
                                         r2(np.asarray(sim.loss_sum)),
                                         r2(np.asarray(sim.wait_sum)))
        demand = r2(np.asarray(sim.demand))
        loaded = r2(np.asarray(sim.loaded))
        departed = r2(np.asarray(sim.departed))
        co2 = r2(np.asarray(sim.co2_sum))
        nox = r2(np.asarray(sim.nox_sum))

        rows = []
        for s in range(S):
            for e in range(E):
                arr = arrived[s, e]
                a_tot = max(float(arr.sum()), 1.0)
                row = {
                    "model_path": pack_paths[s],
                    "episode_id": e,
                    "seed": self.master_seed + e,
                    "main_flow_vph": float(demand[s, e, 0]),
                    "on_ramp_flow_vph": float(demand[s, e, 1]),
                    "off_ramp_flow_vph": float(demand[s, e, 2]),
                    "con_penetration_rate": float(demand[s, e, 3]),
                    "total_throughput": int(arr.sum()),
                    "total_travel_time": float(travel[s, e].sum()),
                    "avg_travel_time": float(travel[s, e].sum()) / a_tot,
                    "total_time_loss": float(loss[s, e].sum()),
                    "avg_time_loss": float(loss[s, e].sum()) / a_tot,
                    "total_waiting_time": float(waited[s, e].sum()),
                    "avg_waiting_time": float(waited[s, e].sum()) / a_tot,
                    "num_teleported_tripinfo": 0,
                    "total_co2_mg": float(co2[s, e]),
                    "total_fuel_ml": float(co2[s, e]) / CO2_PER_FUEL_ML,
                    "total_nox_mg": float(nox[s, e]),
                    "demand_loaded": int(loaded[s, e]),
                    "demand_inserted": int(departed[s, e]),
                    "service_rate": float(departed[s, e])
                    / max(float(loaded[s, e]), 1.0),
                    "num_emergency_stops": 0,
                    "avg_mainline_flow_upstream_v/h": float(f_up[:, s, e].mean()),
                    "avg_mainline_occ_upstream_percent": float(o_up[:, s, e].mean()),
                    "avg_mainline_speed_upstream_km/h": float(s_up[:, s, e].mean()),
                    "avg_mainline_flow_mergeArea_v/h": float(f_mg[:, s, e].mean()),
                    "avg_mainline_occ_mergeArea_percent": float(o_bn[:, s, e].mean()),
                    "avg_mainline_speed_mergeArea_km/h": float(s_bn[:, s, e].mean()),
                    "avg_mainline_flow_downstream_v/h": float(f_dn[:, s, e].mean()),
                    "avg_mainline_occ_downstream_percent": float(o_dn[:, s, e].mean()),
                    "avg_mainline_speed_downstream_km/h": float(s_dn[:, s, e].mean()),
                    "avg_ramp_queue_veh": float(queue[:, s, e].mean()),
                    "total_spillback_time_sec": float(
                        cyc_s * (queue[:, s, e] >= spill_thr).sum()),
                }
                for route, chains in ROUTE_CHAINS.items():
                    ch = list(chains)
                    n = float(arr[ch].sum())
                    row[f"{route}_throughput"] = int(n)
                    row[f"{route}_avg_travel_time"] = (
                        float(travel[s, e][ch].sum()) / n if n else float("nan"))
                    row[f"{route}_avg_time_loss"] = (
                        float(loss[s, e][ch].sum()) / n if n else float("nan"))
                for c in _NAN_COLS:
                    row[c] = float("nan")
                rows.append(row)
        return rows


def write_results_csv(rows: list[dict], out_path: str) -> None:
    """One results CSV per pack, host column order, device-protocol rows."""
    import csv

    # Host merged-row column order (evaluation/parsers.py); model_path is
    # a grouping key, not a column.
    cols = ["episode_id", "seed", "main_flow_vph", "on_ramp_flow_vph",
            "off_ramp_flow_vph", "con_penetration_rate", "total_throughput",
            "total_travel_time", "avg_travel_time", "median_travel_time",
            "std_dev_travel_time", "total_time_loss", "avg_time_loss",
            "median_time_loss", "std_dev_time_loss",
            "sum_of_squared_time_loss", "total_waiting_time",
            "avg_waiting_time", "num_teleported_tripinfo", "total_co2_mg",
            "total_fuel_ml", "total_nox_mg"]
    for route in ROUTE_CHAINS:
        cols += [f"{route}_throughput", f"{route}_avg_travel_time",
                 f"{route}_avg_time_loss"]
    cols += ["demand_loaded", "demand_inserted", "service_rate",
             "num_emergency_stops",
             "avg_mainline_flow_upstream_v/h",
             "avg_mainline_occ_upstream_percent",
             "avg_mainline_speed_upstream_km/h",
             "avg_mainline_flow_mergeArea_v/h",
             "avg_mainline_occ_mergeArea_percent",
             "avg_mainline_speed_mergeArea_km/h",
             "avg_mainline_flow_downstream_v/h",
             "avg_mainline_occ_downstream_percent",
             "avg_mainline_speed_downstream_km/h",
             "avg_ramp_queue_veh", "total_spillback_time_sec"]
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=cols, extrasaction="ignore")
        w.writeheader()
        for r in rows:
            w.writerow(r)
