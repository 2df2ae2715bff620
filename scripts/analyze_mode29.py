"""Contrast the ~29-delay policy mode against the ~31-32 tier (VERDICT r4 #5).

Five of eleven noisy-distributional seeds reach a ~29 s/veh eval-delay mode
no plain head ever found (BENCHMARKS.md seed table). This script asks WHAT
those policies do differently: it rolls each agent through the same seeded
episodes (native backend, greedy — the evaluation protocol of
reference evaluate.py:24-106) and compares per-cycle green-time behaviour
conditioned on demand state (merge-area occupancy terciles).

Output: one row per agent — green-time mean/std, mean green in the low /
mid / high occupancy terciles, the "adaptivity gap" (low-tercile green
minus high-tercile green), and the fraction of cycles at the permissive
(>=30 s) and restrictive (<=10 s) ends of the action set.

Usage: JAX_PLATFORMS='' PYTHONPATH='' python scripts/analyze_mode29.py \
           [-n EPISODES] [--seed MASTER]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# (label, in-protocol delay, pack) — eval-best checkpoints of each seed.
AGENTS = [
    # the ~29 mode (held-out-validated members first)
    ("NoisyIqn s2 [29.0]", "save/rainbow/noisyiqn_s2/NoisyIqnDuelingDQNAgent_lr5e-05_step1000k_model.pack"),
    ("NoisyQr s5  [29.3]", "save/rainbow/noisyqr_s5/NoisyQrDuelingDQNAgent_lr5e-05_step250k_model.pack"),
    ("NoisyQr s6  [29.0]", "save/rainbow/noisyqr_s6/NoisyQrDuelingDQNAgent_lr5e-05_step250k_model.pack"),
    ("NoisyIqn s4 [29.3]", "save/rainbow/noisyiqn_s4/NoisyIqnDuelingDQNAgent_lr5e-05_step375k_model.pack"),
    # the ~31-32 tier (same recipe, different seeds)
    ("NoisyQr s4  [31.1]", "save/rainbow/noisyqr_s4/NoisyQrDuelingDQNAgent_lr5e-05_step375k_model.pack"),
    ("NoisyIqn s5 [31.2]", "save/rainbow/noisyiqn_s5/NoisyIqnDuelingDQNAgent_lr5e-05_step1000k_model.pack"),
    ("NoisyIqn s3 [31.3]", "save/rainbow/noisyiqn_s3/NoisyIqnDuelingDQNAgent_lr5e-05_step1375k_model.pack"),
    # reference points
    ("flagship s0 [30.4]", "save/r2_long/PerDuelingDoubleDQNAgent_lr0.0001_model.pack"),
]


def roll(pack: str, seeds) -> list[dict]:
    from multimodal_drl_rmc_tpu.runtime.rollout import PolicyRunner

    rows = []
    for seed in seeds:
        runner = PolicyRunner(pack, backend="native")
        env = runner.env
        obs = env.reset(seed=int(seed))
        if isinstance(obs, tuple):
            obs = obs[0]
        done = False
        while not done:
            obs, _r, term, trunc, info = env.step(runner.action(obs))
            rows.append(dict(info))
            done = term or trunc
        runner.close()
    return rows


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", type=int, default=10)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()
    seeds = range(args.seed, args.seed + args.n)

    print(f"{args.n} episodes per agent, seeds {args.seed}..{args.seed + args.n - 1}")
    hdr = (f"{'agent':22s} {'green mu+-sd':>13s} {'lowT':>6s} {'midT':>6s} "
           f"{'highT':>6s} {'gap':>6s} {'%>=30s':>7s} {'%<=10s':>7s}")
    print(hdr)
    print("-" * len(hdr))
    for label, pack in AGENTS:
        if not os.path.isfile(pack):
            print(f"{label:22s} MISSING {pack}")
            continue
        rows = roll(pack, seeds)
        g = np.array([r["chosen_green_time_sec"] for r in rows], float)
        occ = np.array([r["mainline_occ_mergeArea_percent"] for r in rows],
                       float)
        t1, t2 = np.quantile(occ, [1 / 3, 2 / 3])
        lo, mid, hi = g[occ <= t1], g[(occ > t1) & (occ <= t2)], g[occ > t2]
        print(f"{label:22s} {g.mean():6.1f}+-{g.std():4.1f} "
              f"{lo.mean():6.1f} {mid.mean():6.1f} {hi.mean():6.1f} "
              f"{lo.mean() - hi.mean():+6.1f} "
              f"{100 * (g >= 30).mean():6.1f}% {100 * (g <= 10).mean():6.1f}%")


if __name__ == "__main__":
    main()
