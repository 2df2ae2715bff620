"""The safety envelope's single decision rule (BENCHMARKS "safety
envelope"): while the PREVIOUS cycle's merge-area occupancy exceeds the
trigger, cap the policy's green at ``cap`` (an action index).

One implementation shared by every guard site so they cannot drift —
the rule is load-bearing for the universal-controller claim (0
catastrophic episodes in 1,800 guarded evaluations):

  * host eval     runtime/rollout.py   PolicyRunner.action
  * host env      envs/rl_controller.py RampMeterEnv.step (env-side
                  training envelope, EnvConfig.guard_occ)
  * device eval   sim/eval_on_device.py DeviceEvaluator._rollout_fn
  * training      sim/train_on_device.py one_iter and
                  sim/train_multiseed.py (guard-in-the-loop; obs
                  feature 4 is occupancy normalized by
                  max_occupancy_percent, so they pass the normalized
                  trigger)

Semantics pinned by tests/test_guard_equiv.py: the trigger is STRICT
(occ_prev > thr; at exactly thr the guard does not bind — 20.0 must
not clamp, the ~29 mode rides occ 17-20), the clamp is min(action,
cap), occ_prev at episode start is 0 (guard never binds on the first
cycle), and thr <= 0 disables the guard entirely.
"""

from __future__ import annotations

import jax.numpy as jnp


def clamp(action, occ_prev, thr: float, cap: int):
    """Apply the envelope to ``action`` (scalar or array, traced or not).

    Returns ``action`` unchanged when ``thr <= 0`` (guard off) — a
    Python-level branch so the off path adds zero ops under jit.
    """
    if thr <= 0.0:
        return action
    return jnp.where(occ_prev > thr, jnp.minimum(action, cap), action)
