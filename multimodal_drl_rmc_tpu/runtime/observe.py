"""Observe CLI: greedy rollout of a trained .pack (reference observe.py)."""

from __future__ import annotations

import argparse

from .rollout import PolicyRunner
from .train import str2bool


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description="OBSERVE")
    parser.add_argument("-d", type=str, required=True, help="model .pack path")
    parser.add_argument("-gpu", type=str, default="0", help="ignored (TPU build)")
    parser.add_argument("-max_s", type=int, default=0, help="max steps/episode (0=inf)")
    parser.add_argument("-max_e", type=int, default=0, help="max episodes (0=inf)")
    parser.add_argument("-log", type=str2bool, default=False)
    parser.add_argument("-log_s", type=int, default=0)
    parser.add_argument("-log_dir", type=str, default="./logs/test/")
    parser.add_argument("-backend", type=str, default="auto",
                        choices=("auto", "fake", "native", "sumo"))
    parser.add_argument("-obs_variant", type=str, default="hybrid",
                        choices=("hybrid", "macro_lane", "macro_no_lane"))
    parser.add_argument("-gui", type=str2bool, default=False)
    args = parser.parse_args(argv)

    runner = PolicyRunner(
        args.d, backend=args.backend, obs_variant=args.obs_variant,
        gui=args.gui, max_steps=args.max_s,
        log=args.log, log_step=args.log_s, log_dir=args.log_dir,
    )
    print("OBSERVE", args.d, f"(ckpt step {runner.meta.get('step', '?')})")
    episodes = args.max_e if args.max_e > 0 else 1_000_000_000
    runner.run(episodes)


if __name__ == "__main__":
    main()
