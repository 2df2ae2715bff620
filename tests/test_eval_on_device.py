"""On-device vmapped evaluator (sim/eval_on_device.py).

Structural semantics only (tiny cycle counts — CPU): row schema, episode
pairing across stacked snapshots, determinism, spec-mix guard, CSV output.
Protocol-level numbers are validated on the chip (BENCHMARKS.md device-eval
section).
"""

import csv
import math
import os

import jax
import numpy as np
import pytest

from multimodal_drl_rmc_tpu.sim.eval_on_device import (
    DeviceEvaluator,
    write_results_csv,
)

PACKS = {
    "plain": "save/1ramp_1x3/DuelingDoubleDQNAgent_lr0.0001_model.pack",
    "noisyiqn": "save/1ramp_1x3/NoisyIqnDuelingDQNAgent_lr5e-05_model.pack",
    "qr": "save/1ramp_1x3/QrDuelingDQNAgent_lr0.0001_model.pack",
}
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _pack(name):
    p = os.path.join(REPO, PACKS[name])
    if not os.path.isfile(p):
        pytest.skip(f"trained pack missing: {p}")
    return p


def test_rows_schema_and_pairing(tmp_path):
    ev = DeviceEvaluator(n_episodes=3, master_seed=7, cycles=4)
    rows = ev.evaluate([_pack("noisyiqn")])
    assert len(rows) == 3
    for r in rows:
        assert r["seed"] == 7 + r["episode_id"]
        for k, v in r.items():
            if isinstance(v, float) and k not in (
                    "median_travel_time", "std_dev_travel_time",
                    "median_time_loss", "std_dev_time_loss",
                    "sum_of_squared_time_loss"):
                assert math.isfinite(v), (k, v)
        # Routes partition the total.
        assert (r["Mainline_throughput"] + r["On-Ramp_throughput"]
                + r["Off-Ramp_throughput"]) == r["total_throughput"]
    # Distinct episodes draw distinct demand.
    assert len({r["main_flow_vph"] for r in rows} |
               {r["on_ramp_flow_vph"] for r in rows}) > 1

    out = tmp_path / "results_device_test.csv"
    write_results_csv(rows, str(out))
    with open(out) as f:
        got = list(csv.DictReader(f))
    assert len(got) == 3 and "avg_time_loss" in got[0]


def test_identical_params_and_paired_episodes_bit_match():
    """Stacked snapshot axis: the same pack twice must produce identical
    per-episode rows (same reset key per episode across the S axis)."""
    p = _pack("plain")
    ev = DeviceEvaluator(n_episodes=2, master_seed=3, cycles=3)
    rows = ev.evaluate([p, p])
    a = [r for r in rows if r["episode_id"] == 0]
    assert len(a) == 2
    for k in ("total_travel_time", "avg_ramp_queue_veh", "main_flow_vph",
              "total_co2_mg", "demand_inserted"):
        assert a[0][k] == a[1][k], k


def test_padding_does_not_change_real_episode_rows(monkeypatch):
    """S*E=850-style batches (17 packs x 50 eps) have no 8-divisible env
    tile; the evaluator pads the episode axis and drops pad rows. The
    REAL episodes' reset keys and row values must be unchanged by
    padding (block=1 divides everything -> no padding; block=8 pads
    E=3 -> 8)."""
    p = _pack("plain")

    def run(block):
        monkeypatch.setenv("MDRLRMC_BLOCK", block)
        ev = DeviceEvaluator(n_episodes=3, master_seed=11, cycles=3)
        assert ev._padded_E(1) == (3 if block == "1" else 8)
        return ev.evaluate([p])

    unpadded, padded = run("1"), run("8")
    assert len(padded) == 3
    for ru, rp in zip(unpadded, padded):
        assert ru["seed"] == rp["seed"]
        for k in ("main_flow_vph", "total_travel_time", "total_throughput",
                  "avg_ramp_queue_veh", "total_co2_mg"):
            np.testing.assert_allclose(ru[k], rp[k], rtol=1e-5, err_msg=k)


def test_block_for_rejects_unlowerable_tile():
    """_block_for must raise the padding remedy on TPU-bound batches with
    no 8-multiple divisor (the 850-env sweep crash), and keep the legal
    cases: dividing block, whole-batch tile, interpret mode."""
    from multimodal_drl_rmc_tpu.ops.pallas.sim_step import _block_for

    with pytest.raises(ValueError, match="pad the batch"):
        _block_for(850, 8)
    assert _block_for(850, 8, interpret=True) == 5
    assert _block_for(800, 8) == 8
    assert _block_for(4, 8) == 4          # whole batch is a legal tile
    assert _block_for(856, 8) == 8        # the padded sweep batch


def test_spec_mix_rejected():
    with pytest.raises(ValueError, match="mix NetworkSpecs"):
        DeviceEvaluator(n_episodes=1, cycles=2).evaluate(
            [_pack("plain"), _pack("qr")])


def test_no_autoreset_at_full_horizon():
    """cycles = full episode: the final carry keeps cumulative stats (the
    auto-reset must NOT fire on the last cycle — reset starts t at 5 s,
    the regression this pins)."""
    ev = DeviceEvaluator(n_episodes=1, master_seed=0, cycles=12)
    # 12 cycles only reach t=485 of the 3600 s demand profile, but the
    # counters must be nonzero and monotone vs a shorter run.
    short = DeviceEvaluator(n_episodes=1, master_seed=0, cycles=6)
    r12 = ev.evaluate([_pack("plain")])[0]
    r6 = short.evaluate([_pack("plain")])[0]
    assert r12["demand_inserted"] > r6["demand_inserted"] > 0
    assert r12["total_throughput"] >= r6["total_throughput"]
    assert r12["total_throughput"] > 0


def test_alinea_controller_matches_host_recursion():
    """The device ALINEA / PI-ALINEA laws must reproduce the host
    controllers' per-cycle rate/green recursions (envs/baselines.py
    AlineaDsBaseline._update_rate / PiAlineaDsBaseline._update_rate,
    reference baselines.py:135-253) on an arbitrary occupancy sequence."""
    import jax.numpy as jnp

    from multimodal_drl_rmc_tpu.config import EnvConfig
    from multimodal_drl_rmc_tpu.sim.eval_on_device import _make_controller

    cfg = EnvConfig()
    occs = [0.0, 5.0, 25.0, 40.0, 17.0, 3.0, 60.0, 0.0]

    # Host ALINEA recursion (numpy scalars).
    rate_h = (180.0 + 1900.0) / 2
    greens_h = []
    for occ in occs:
        rate_h = float(np.clip(rate_h + 60.0 * (17.0 - occ), 180.0, 1900.0))
        g = rate_h * (cfg.cycle_seconds / 3600.0) / 0.5
        greens_h.append(float(np.clip(g, 3.0, cfg.cycle_seconds)))

    carry, step = _make_controller("AlineaDsBaseline", cfg, 1)
    greens_d = []
    for occ in occs:
        carry, g = step(carry, jnp.asarray([occ], jnp.float32))
        greens_d.append(float(g[0]))
    np.testing.assert_allclose(greens_d, greens_h, rtol=1e-6)

    # Host PI-ALINEA recursion with conditional anti-windup.
    rate_h, integral = (180.0 + 1900.0) / 2, 0.0
    greens_h = []
    for occ in occs:
        err = 17.0 - occ
        integral += err
        new_rate = rate_h + 60.0 * err + 10.0 * integral
        if new_rate > 1800.0 or new_rate < 180.0:
            integral -= err
        rate_h = float(np.clip(new_rate, 180.0, 1800.0))
        g = rate_h * (cfg.cycle_seconds / 3600.0) / 0.5
        greens_h.append(float(np.clip(g, 3.0, cfg.cycle_seconds)))

    carry, step = _make_controller("PiAlineaDsBaseline", cfg, 1)
    greens_d = []
    for occ in occs:
        carry, g = step(carry, jnp.asarray([occ], jnp.float32))
        greens_d.append(float(g[0]))
    np.testing.assert_allclose(greens_d, greens_h, rtol=1e-6)


def test_step_green_matches_step_on_action_grid():
    """env.step_green(actions_sec[a]) must equal env.step(a) exactly —
    the classical-controller path and the agent path share one cycle
    kernel."""
    import jax.numpy as jnp

    from multimodal_drl_rmc_tpu.config import EnvConfig, ScenarioConfig
    from multimodal_drl_rmc_tpu.sim.env import DeviceRampEnv

    cfg = EnvConfig(scenario=ScenarioConfig(episode_seconds=200.0))
    env = DeviceRampEnv(cfg, 2)
    states, _ = env.reset(jax.random.PRNGKey(5))
    actions = jnp.asarray([2, 6])
    sa, (oa, na, ra, da, _) = env.step(states, actions)
    sg, (og, ng, rg, dg, _) = env.step_green(
        states, env.actions_sec[actions])
    np.testing.assert_array_equal(np.asarray(oa), np.asarray(og))
    np.testing.assert_array_equal(np.asarray(ra), np.asarray(rg))
    np.testing.assert_array_equal(np.asarray(sa.sim.pos),
                                  np.asarray(sg.sim.pos))


def test_evaluate_strategy_rows():
    """Device-protocol classical rows: host CSV schema, paired reset keys
    with pack rows, and ALINEA metering restrictively at a congested
    merge (sanity of the law's sign)."""
    ev = DeviceEvaluator(n_episodes=2, master_seed=3, cycles=4)
    rows = ev.evaluate_strategy("FixedCycleBaseline")
    assert len(rows) == 2
    assert rows[0]["model_path"] == "FixedCycleBaseline"
    assert rows[0]["seed"] == 3 and rows[1]["seed"] == 4
    assert rows[0]["total_throughput"] > 0
    assert math.isfinite(rows[0]["avg_time_loss"])
    # Same reset keys as pack rows: demand draws must match episode-wise.
    packs = ev.evaluate([_pack("plain")])
    for rs, rp in zip(rows, packs):
        assert rs["main_flow_vph"] == rp["main_flow_vph"]
        assert rs["con_penetration_rate"] == rp["con_penetration_rate"]
    for strat in ("AlwaysGreenBaseline", "AlineaDsBaseline",
                  "PiAlineaDsBaseline"):
        r = ev.evaluate_strategy(strat)
        assert len(r) == 2 and r[0]["total_throughput"] > 0, strat
