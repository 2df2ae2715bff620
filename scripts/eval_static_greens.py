"""Static-green ablation: evaluate every constant-action policy in the
DQN's own action class under the canonical 50-episode seeded protocol.

The RL claim "beats every classical controller" is incomplete without
the degenerate members of the agent's OWN policy class: a fixed green
time g repeated every 40 s cycle (the reference's FixedCycle baseline
uses a different cycle structure — `play.py` strategies — so it does not
cover these). This sweep established that constant-25 s matches the
scalar flagship band (31.59 delay at 50 episodes) — i.e., an agent only
demonstrates *adaptive* value once it beats the best static green,
which NoisyQr seed 2 was the first to do (29.21, paired -2.38 +/- 0.29
s/veh vs constant-25 s, 46/50 episode wins). See BENCHMARKS.md.

Runs on CPU (`JAX_PLATFORMS='' PYTHONPATH='' python
scripts/eval_static_greens.py [-n 50] [-o evaluation/results_static]`).
Reference protocol: evaluate.py:24-106 (seed = master + i, fresh env
per episode); the constant policy is injected by overriding
PolicyRunner.action, so the whole pipeline (backend, tripinfo parsing,
CSV schema) is identical to the agent evaluations.
"""

from __future__ import annotations

import argparse
import csv
import os

from multimodal_drl_rmc_tpu.config import Config
from multimodal_drl_rmc_tpu.runtime import evaluate as ev
from multimodal_drl_rmc_tpu.runtime.rollout import PolicyRunner

# Any valid pack works: the network is loaded but its actions are
# overridden; the flagship pack ships with the repo.
DEFAULT_PACK = "save/1ramp_1x3/PerDuelingDoubleDQNAgent_lr0.0001_model.pack"


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", type=int, default=50, help="episodes per green")
    ap.add_argument("-o", default="evaluation/results_static")
    ap.add_argument("--master-seed", type=int, default=42)
    ap.add_argument("--backend", default="native")
    ap.add_argument("-d", "--model", default=DEFAULT_PACK)
    ap.add_argument("--actions", type=int, nargs="*", default=None,
                    help="action indices to sweep (default: all)")
    ap.add_argument("--noise", type=float, default=0.0,
                    help="driver-imperfection accel noise sigma (m/s^2)")
    ap.add_argument("--tag-suffix", default="",
                    help="extra CSV-tag suffix (e.g. Noise01)")
    args = ap.parse_args(argv)

    greens = Config().env.green_time_actions_sec
    actions = (args.actions if args.actions is not None
               else range(len(greens)))
    orig_action = PolicyRunner.action
    try:
        for act in actions:
            tag = f"StaticG{int(greens[act])}{args.tag_suffix}"
            out_csv = os.path.join(args.o, f"results_DQNAgent{tag}.csv")
            if os.path.exists(out_csv):
                print(f"skip {tag}: {out_csv} exists")
                continue
            PolicyRunner.action = lambda self, obs, _a=act: _a
            ev.main(["-s", "DQNAgent", "-n", str(args.n),
                     "--master-seed", str(args.master_seed),
                     "--backend", args.backend, "-d", args.model,
                     "--tag", tag, "-o", args.o,
                     "--noise", str(args.noise)])
    finally:
        PolicyRunner.action = orig_action

    print(f"\n{'green':>6} {'TTT':>10} {'delay':>7} {'thr':>6} {'spill':>7}")
    for act in actions:
        tag = f"StaticG{int(greens[act])}{args.tag_suffix}"
        path = os.path.join(args.o, f"results_DQNAgent{tag}.csv")
        if not os.path.exists(path):
            continue
        rows = list(csv.DictReader(open(path)))
        f = lambda k: sum(float(r[k]) for r in rows) / len(rows)
        print(f"{greens[act]:>6g} {f('total_travel_time'):>10,.0f}"
              f" {f('avg_time_loss'):>7.2f} {f('total_throughput'):>6,.0f}"
              f" {f('total_spillback_time_sec'):>7.0f}")


if __name__ == "__main__":
    main()
