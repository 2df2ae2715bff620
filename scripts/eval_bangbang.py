"""Bang-bang occupancy ablation for the safety envelope (BENCHMARKS
"safety envelope"): green 40 s until last-cycle merge occupancy exceeds
--occ, then 10 s — i.e. the ENVELOPE ALONE wrapped around the most
permissive static policy. If this matches the guarded learned agents,
the learned policy adds nothing beyond the guard; measured, it does not
(see BENCHMARKS). Reuses PolicyRunner's guard state via a monkeypatched
action(), evaluate.py for the protocol."""
import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from multimodal_drl_rmc_tpu.runtime import evaluate as ev
from multimodal_drl_rmc_tpu.runtime.rollout import PolicyRunner

DEFAULT_PACK = "save/1ramp_1x3/PerDuelingDoubleDQNAgent_lr0.0001_model.pack"


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", type=int, default=50)
    ap.add_argument("--master-seed", type=int, default=42)
    ap.add_argument("-o", default="evaluation/results")
    ap.add_argument("--occ", type=float, default=20.0)
    ap.add_argument("--hi", type=int, default=7, help="open action (40 s)")
    ap.add_argument("--lo", type=int, default=1, help="guarded action (10 s)")
    ap.add_argument("--noise", type=float, default=0.0)
    ap.add_argument("--tag", default=None)
    args = ap.parse_args(argv)

    tag = args.tag or (f"BangBangO{int(args.occ)}"
                       + (f"Noise{str(args.noise).replace('0.', '0')}"
                          if args.noise else ""))
    orig = PolicyRunner.action
    try:
        def action(self, obs):
            return args.lo if self._last_occ > args.occ else args.hi
        PolicyRunner.action = action
        ev.main(["-s", "DQNAgent", "-n", str(args.n),
                 "--master-seed", str(args.master_seed),
                 "--backend", "native", "-d", DEFAULT_PACK,
                 "--tag", tag, "-o", args.o, "--noise", str(args.noise)])
    finally:
        PolicyRunner.action = orig


if __name__ == "__main__":
    main()
