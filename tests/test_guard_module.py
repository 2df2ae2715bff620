"""The shared safety-envelope rule (guard.clamp) and its wiring.

The guard is load-bearing for the universal-controller claim (0
catastrophic episodes in 1,800 guarded evaluations, BENCHMARKS "safety
envelope"), and round 4 shipped it as four hand-written copies (host
PolicyRunner, host env, device evaluator, device trainers). Round 5
consolidated them into one function — these tests pin its decision
table (strict trigger, min-cap, off at thr<=0) and that every site
actually routes through it, so the implementations cannot drift apart
again (round-4 VERDICT stretch item #7).
"""

import inspect

import jax.numpy as jnp
import numpy as np

from multimodal_drl_rmc_tpu import guard


def test_clamp_decision_table():
    """Strict trigger (> not >=), min-cap, identity below trigger."""
    thr, cap = 20.0, 1
    cases = [
        # (action, occ_prev, expected)
        (7, 0.0, 7),          # far below: untouched
        (7, 19.99, 7),        # just below: untouched
        (7, 20.0, 7),         # AT the trigger: strict > must not bind
        (7, 20.01, 1),        # just above: capped
        (7, 100.0, 1),        # far above: capped
        (0, 100.0, 0),        # already below cap: min() keeps it
        (1, 100.0, 1),        # at cap: unchanged
        (2, 100.0, 1),        # one above cap: clamped to cap
    ]
    for a, occ, want in cases:
        got = int(guard.clamp(a, occ, thr, cap))
        assert got == want, (a, occ, got, want)


def test_clamp_off_is_identity_and_free():
    """thr <= 0 disables the guard via a PYTHON branch: the input object
    comes back unchanged (no tracing cost, bit-identical training)."""
    a = jnp.arange(8)
    assert guard.clamp(a, jnp.full((8,), 99.0), 0.0, 1) is a
    assert guard.clamp(a, jnp.full((8,), 99.0), -1.0, 1) is a
    assert guard.clamp(5, 99.0, 0.0, 1) == 5


def test_clamp_batched_matches_scalar():
    """Array form (device paths) == scalar form (host paths) elementwise."""
    rng = np.random.default_rng(0)
    acts = rng.integers(0, 8, size=64)
    occs = rng.uniform(0.0, 40.0, size=64).astype(np.float32)
    thr, cap = 20.0, 3
    batched = np.asarray(guard.clamp(jnp.asarray(acts), jnp.asarray(occs),
                                     thr, cap))
    scalar = np.asarray([int(guard.clamp(int(a), float(o), thr, cap))
                         for a, o in zip(acts, occs)])
    np.testing.assert_array_equal(batched, scalar)


def test_every_guard_site_routes_through_clamp():
    """Source pin: the four guard sites call guard.clamp, not a local
    re-implementation. (The behavioral equivalence of host env vs
    PolicyRunner wrapping is pinned end-to-end in
    tests/test_guard_training.py; this catches a regression to an
    inline copy at any single site.)"""
    from multimodal_drl_rmc_tpu.envs import rl_controller
    from multimodal_drl_rmc_tpu.runtime import rollout
    from multimodal_drl_rmc_tpu.sim import (
        eval_on_device, train_multiseed, train_on_device,
    )

    sites = [
        inspect.getsource(rollout.PolicyRunner.action),
        inspect.getsource(rl_controller.RampMeterEnv.step),
        inspect.getsource(eval_on_device.DeviceEvaluator._rollout_fn),
        inspect.getsource(train_on_device.DeviceTrainer.__init__),
        inspect.getsource(train_multiseed),
    ]
    for src in sites:
        assert "guard.clamp(" in src
        assert "jnp.minimum(act" not in src  # no inline copies left


def test_policy_runner_action_matches_clamp(tmp_path):
    """PolicyRunner.action == greedy action passed through guard.clamp
    with the runner's tracked previous-cycle occupancy."""
    from multimodal_drl_rmc_tpu.runtime.rollout import PolicyRunner

    runner = PolicyRunner.__new__(PolicyRunner)
    runner.params = None
    runner._greedy = lambda params, obs: np.asarray([6])
    runner.guard_occ, runner.guard_cap = 17.0, 3
    obs = np.zeros((284,), np.float32)
    for occ in (0.0, 16.9, 17.0, 17.1, 30.0):
        runner._last_occ = occ
        want = int(guard.clamp(6, occ, 17.0, 3))
        assert runner.action(obs) == want, occ
