"""Pallas kernel parity tests (run in interpret mode on the CPU mesh;
compiled on real TPU by the same entry points)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_drl_rmc_tpu.config import EnvConfig, NetworkSpec, ScenarioConfig
from multimodal_drl_rmc_tpu.models.networks import build_network, greedy_fn, init_params
from multimodal_drl_rmc_tpu.ops.pallas.dueling import dueling_greedy_actions
from multimodal_drl_rmc_tpu.ops.pallas.sim_step import fused_substeps
from multimodal_drl_rmc_tpu.sim import core


def test_dueling_greedy_matches_xla():
    net = build_network(NetworkSpec(), 8)
    params = init_params(net, 284, jax.random.PRNGKey(0))
    obs = jax.random.uniform(jax.random.PRNGKey(1), (32, 284))
    ref = greedy_fn(net)(params, obs)
    adv = params["params"]["fc_adv"]
    feat = net.apply(params, obs, method=lambda m, x: m.trunk(x))
    fused = dueling_greedy_actions(feat, adv["kernel"], adv["bias"],
                                   interpret=True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(fused))


def test_dueling_greedy_tie_break_lowest_index():
    feat = jnp.ones((4, 16), jnp.float32)
    w = jnp.zeros((16, 8), jnp.float32)       # all-equal advantages
    b = jnp.zeros((8,), jnp.float32)
    out = dueling_greedy_actions(feat, w, b, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.zeros(4, np.int32))


@pytest.fixture(scope="module")
def traffic_states():
    cfg = EnvConfig(scenario=ScenarioConfig(episode_seconds=3600.0))
    vreset = jax.jit(jax.vmap(lambda r: core.reset(r, cfg.scenario)))
    sims = vreset(jax.random.split(jax.random.PRNGKey(0), 4))

    def adv(s):
        def body(ss, _):
            return core.step_1s(ss), None
        return jax.lax.scan(body, s, None, length=50)[0]

    return jax.jit(jax.vmap(adv))(sims)


def test_fused_substeps_matches_xla(traffic_states):
    sims = traffic_states

    def two_sub(s):
        return core._substep(core._substep(s))

    ref = jax.jit(jax.vmap(two_sub))(sims)
    red = (sims.phase == core.RED).astype(jnp.float32)
    pos, speed, wait = fused_substeps(
        sims.pos, sims.speed, sims.active.astype(jnp.float32), sims.wait,
        sims.head, red, block=1, interpret=True,
    )
    act = np.asarray(sims.active)
    np.testing.assert_allclose(
        np.where(act, np.asarray(ref.pos), 0.0),
        np.where(act, np.asarray(pos), 0.0), atol=1e-4)
    np.testing.assert_allclose(
        np.where(act, np.asarray(ref.speed), 0.0),
        np.where(act, np.asarray(speed), 0.0), atol=1e-4)
    np.testing.assert_allclose(
        np.where(act, np.asarray(ref.wait), 0.0),
        np.where(act, np.asarray(wait), 0.0), atol=1e-4)


def test_fused_substeps_red_phase_holds_stop_line(traffic_states):
    """With phase forced red, no ramp vehicle crosses the stop line."""
    sims = traffic_states
    red = jnp.ones((4,), jnp.float32)
    before = np.asarray(sims.pos[:, 3, :])
    act = np.asarray(sims.active[:, 3, :])
    stop = float(core._STOP_LINE[3])
    behind = act & (before < stop)
    pos, _, _ = fused_substeps(
        sims.pos, sims.speed, sims.active.astype(jnp.float32), sims.wait,
        sims.head, red, block=1, interpret=True,
    )
    after = np.asarray(pos[:, 3, :])
    assert np.all(after[behind] <= stop + 0.5)


def test_fused_step_detectors_match_xla(traffic_states):
    """fused_step's detector aggregates == the XLA _detector_pass."""
    from multimodal_drl_rmc_tpu.ops.pallas.sim_step import fused_step

    sims = traffic_states
    red = (sims.phase == core.RED).astype(jnp.float32)

    def xla_step(s):
        pos_prev = s.pos
        s = core._substep(core._substep(s))
        return core._detector_pass(s._replace(t=s.t + 1.0), pos_prev)

    ref = jax.jit(jax.vmap(xla_step))(sims)
    pos, speed, wait, cnt, spd, occ, queue = fused_step(
        sims.pos, sims.speed, sims.active.astype(jnp.float32), sims.wait,
        sims.head, red, block=1, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(ref.loop_count - sims.loop_count), np.asarray(cnt), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(ref.loop_speed_sum - sims.loop_speed_sum), np.asarray(spd),
        atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(ref.loop_occ_time - sims.loop_occ_time), np.asarray(occ),
        atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(ref.sum_queue - sims.sum_queue), np.asarray(queue), atol=1e-4)


def test_fused_step_full_matches_xla(traffic_states):
    """The whole-1s-step kernel (physics + detectors + emissions +
    breakdown + pop + spawn) == the XLA step_1s, field by field."""
    sims = traffic_states

    def xla_step(s):
        return core.step_1s(s)  # CPU -> XLA path

    ref = jax.jit(jax.vmap(xla_step))(sims)

    def pallas_step(s):
        rng, r_con = jax.random.split(s.rng)
        u_con = jax.random.uniform(r_con, (core.N_CHAINS,))
        s = s._replace(rng=rng)
        return core._step_1s_full_pallas(s, u_con, interpret=True)

    got = jax.jit(jax.vmap(pallas_step))(sims)

    act = np.asarray(ref.active)
    for name in core.SimState._fields:
        r = np.asarray(getattr(ref, name))
        g = np.asarray(getattr(got, name))
        if name == "rng":
            np.testing.assert_array_equal(r, g)
            continue
        if r.shape[-1:] == (core.SLOTS,):
            # Inactive slots may hold 1e9 vs stale values; compare only
            # slots active in EITHER (covers popped + spawned slots).
            either = act | np.asarray(got.active)
            r = np.where(either, r, 0.0)
            g = np.where(either, g, 0.0)
        np.testing.assert_allclose(
            r.astype(np.float64), g.astype(np.float64),
            rtol=1e-5, atol=1e-3, err_msg=f"field {name}")


def test_fused_step_full_over_a_cycle(traffic_states):
    """40 consecutive full-kernel steps stay in lockstep with XLA (ring
    wraparound, spawns, pops, breakdown accumulation all exercised)."""
    sims = jax.tree_util.tree_map(lambda x: x[:2], traffic_states)

    def run_pallas(s):
        def body(ss, _):
            rng, r_con = jax.random.split(ss.rng)
            u_con = jax.random.uniform(r_con, (core.N_CHAINS,))
            ss = ss._replace(rng=rng)
            return core._step_1s_full_pallas(ss, u_con, interpret=True), None
        return jax.lax.scan(body, s, None, length=40)[0]

    def run_xla(s):
        def body(ss, _):
            return core.step_1s(ss), None
        return jax.lax.scan(body, s, None, length=40)[0]

    ref = jax.jit(jax.vmap(run_xla))(sims)
    got = jax.jit(jax.vmap(run_pallas))(sims)

    np.testing.assert_allclose(np.asarray(ref.arrived), np.asarray(got.arrived))
    np.testing.assert_allclose(np.asarray(ref.travel_sum),
                               np.asarray(got.travel_sum), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ref.loop_count),
                               np.asarray(got.loop_count))
    np.testing.assert_allclose(np.asarray(ref.co2_sum),
                               np.asarray(got.co2_sum), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(ref.breakdown),
                               np.asarray(got.breakdown), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(ref.head), np.asarray(got.head))
    np.testing.assert_array_equal(np.asarray(ref.count), np.asarray(got.count))


def test_step_1s_batched_matches_vmapped(traffic_states):
    """core.step_1s_batched (whole batch as BT>1 kernel blocks) ==
    vmap(step_1s) on the XLA path — same RNG stream, same fields."""
    sims = traffic_states
    ref = jax.jit(jax.vmap(core.step_1s))(sims)
    got = jax.jit(lambda s: core.step_1s_batched(s, interpret=True))(sims)

    act = np.asarray(ref.active)
    for name in core.SimState._fields:
        r = np.asarray(getattr(ref, name))
        g = np.asarray(getattr(got, name))
        if name == "rng":
            np.testing.assert_array_equal(r, g)
            continue
        if r.shape[-1:] == (core.SLOTS,):
            either = act | np.asarray(got.active)
            r = np.where(either, r, 0.0)
            g = np.where(either, g, 0.0)
        np.testing.assert_allclose(
            r.astype(np.float64), g.astype(np.float64),
            rtol=1e-5, atol=1e-3, err_msg=f"field {name}")


@pytest.mark.slow
def test_batched_env_step_matches_vmapped():
    """Env-level: make_batched_step == vmap(step_one) over a full control
    cycle (obs, reward, done, auto-reset)."""
    from multimodal_drl_rmc_tpu.sim.env import (
        DeviceRampEnv, make_batched_step,
    )

    cfg = EnvConfig(scenario=ScenarioConfig(episode_seconds=200.0))
    env = DeviceRampEnv(cfg, 2)
    states, obs0 = env.reset(jax.random.PRNGKey(3))
    actions = jnp.asarray([1, 6])

    ref_states, (ref_obs, ref_next, ref_rew, ref_done, _) = env.step(
        states, actions)
    step_b = jax.jit(make_batched_step(cfg, interpret=True)[0])
    got_states, (got_obs, got_next, got_rew, got_done, _) = step_b(
        states, actions)

    np.testing.assert_allclose(np.asarray(ref_obs), np.asarray(got_obs),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ref_rew), np.asarray(got_rew),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(ref_done), np.asarray(got_done))
    np.testing.assert_array_equal(np.asarray(ref_states.sim.rng),
                                  np.asarray(got_states.sim.rng))


def test_fused_step_full_noise_parity(traffic_states):
    """Driver-noise mode (accel_noise_sigma > 0): the fused kernel's
    noise input — pre-drawn outside like the spawn uniforms — makes the
    Pallas path consume the identical RNG stream as the XLA noise path,
    so the two stay in lockstep field by field."""
    sims = jax.tree_util.tree_map(lambda x: x[:2], traffic_states)
    SIGMA = 0.1

    ref = jax.jit(jax.vmap(lambda s: core.step_1s(s, SIGMA)))(sims)

    orig = core._PALLAS_CHOICE["v"]
    core._PALLAS_CHOICE["v"] = False  # ref above took the XLA path anyway
    try:
        got = jax.jit(lambda s: core.step_1s_batched(
            s, interpret=True, sigma=SIGMA))(sims)
    finally:
        core._PALLAS_CHOICE["v"] = orig

    act = np.asarray(ref.active)
    for name in core.SimState._fields:
        r = np.asarray(getattr(ref, name))
        g = np.asarray(getattr(got, name))
        if name == "rng":
            np.testing.assert_array_equal(r, g)
            continue
        if r.shape[-1:] == (core.SLOTS,):
            either = act | np.asarray(got.active)
            r = np.where(either, r, 0.0)
            g = np.where(either, g, 0.0)
        np.testing.assert_allclose(
            r.astype(np.float64), g.astype(np.float64),
            rtol=1e-5, atol=1e-3, err_msg=f"field {name}")


def test_fused_step_full_noise_perturbs(traffic_states):
    """sigma > 0 through the kernel actually changes trajectories vs
    sigma = 0 (the noise input is live, not dropped)."""
    sims = jax.tree_util.tree_map(lambda x: x[:2], traffic_states)
    base = jax.jit(lambda s: core.step_1s_batched(s, interpret=True))(sims)
    noisy = jax.jit(lambda s: core.step_1s_batched(
        s, interpret=True, sigma=0.1))(sims)
    both = np.asarray(base.active) & np.asarray(noisy.active)
    dv = (np.asarray(noisy.speed) - np.asarray(base.speed))[both]
    assert np.abs(dv).max() > 1e-4
