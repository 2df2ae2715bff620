"""n-step return accumulation for replay insertion.

Extension over the reference (which is strictly 1-step TD,
dqn/agent.py:166-272); ``HyperParams.n_step == 1`` reproduces reference
behavior exactly. The learner side needs no change: ``dqn_loss`` receives
``gamma ** n_step`` and transitions whose ``reward`` is the discounted
n-step return and whose ``next_obs`` is the state n steps ahead
(ops/losses.py).

Host-side accumulator: per-env FIFO of pending transitions; a transition
is emitted once n future rewards are known, or immediately (with a shorter
horizon and done=1) when the episode terminates. Emission count per push
varies, so this stays host-side numpy — the device insert is already
batch-size agnostic.
"""

from __future__ import annotations

from collections import deque

import jax.numpy as jnp
import numpy as np

from .losses import Batch


def nstep_window_reduce(rew_w, done_w, gamma: float):
    """Fixed-shape n-step reduction for the on-device trainer.

    rew_w/done_w: [n, B] — the window's per-step rewards and terminal flags
    (oldest first). Returns (R, done_n): the discounted return masked at the
    first terminal (rewards after a done belong to the auto-reset's next
    episode and must not leak in), and whether any step in the window
    terminated. Matches the host NStepAccumulator's emit-on-terminal
    semantics: a terminal inside the window yields the partial return with
    done=1, so the TD target never bootstraps and the shorter horizon is
    exact (the learner's gamma**n multiplies (1-done), which is 0).
    """
    n = rew_w.shape[0]
    cont = jnp.cumprod(1.0 - done_w, axis=0)                    # [n, B]
    mask = jnp.concatenate([jnp.ones_like(cont[:1]), cont[:-1]], axis=0)
    gammas = (gamma ** jnp.arange(n, dtype=rew_w.dtype))[:, None]
    ret = (gammas * rew_w * mask).sum(axis=0)
    done_n = 1.0 - cont[-1]
    return ret, done_n


class NStepAccumulator:
    def __init__(self, n_step: int, gamma: float, n_env: int):
        self.n = n_step
        self.gamma = gamma
        self.pending = [deque() for _ in range(n_env)]

    def push(self, obs, action, reward, done, next_obs,
             truncated=None) -> Batch | None:
        """Feed one vectorized 1-step transition; returns ready n-step
        transitions (or None). Arrays are [n_env, ...].

        ``done`` marks true MDP terminals (pending entries emit with their
        partial return and done=1 — the target never bootstraps, so the
        shorter horizon is exact). ``truncated`` marks artificial episode
        cuts: pending entries are DISCARDED there, because a bootstrapped
        target with horizon < n would be mismatched against the learner's
        fixed gamma**n."""
        out = []
        for i in range(len(self.pending)):
            q = self.pending[i]
            q.append([obs[i], int(action[i]), float(reward[i])])
            # Fold the new reward into older pending entries.
            for age, entry in enumerate(reversed(q)):
                if age > 0:
                    entry[2] += (self.gamma ** age) * float(reward[i])
            if done[i]:
                # Terminal: everything pending bootstraps to nothing.
                while q:
                    o, a, r = q.popleft()
                    out.append((o, a, r, 1.0, next_obs[i]))
            elif truncated is not None and truncated[i]:
                q.clear()
            elif len(q) == self.n:
                o, a, r = q.popleft()
                out.append((o, a, r, 0.0, next_obs[i]))
        if not out:
            return None
        obs_b, act_b, rew_b, done_b, next_b = zip(*out)
        return Batch(
            obs=np.stack(obs_b),
            action=np.asarray(act_b, np.int32),
            reward=np.asarray(rew_b, np.float32),
            done=np.asarray(done_b, np.float32),
            next_obs=np.stack(next_b),
        )
