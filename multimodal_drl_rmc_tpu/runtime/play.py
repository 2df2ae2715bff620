"""Play CLI: run a named baseline controller (reference play.py)."""

from __future__ import annotations

import argparse

from ..envs.baselines import BASELINES
from .rollout import BaselineRunner
from .train import str2bool


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description="PLAY")
    parser.add_argument("-player", type=str, required=True,
                        choices=tuple(BASELINES.keys()))
    parser.add_argument("-max_s", type=int, default=0)
    parser.add_argument("-max_e", type=int, default=0)
    parser.add_argument("-log", type=str2bool, default=False)
    parser.add_argument("-log_s", type=int, default=0)
    parser.add_argument("-log_dir", type=str, default="./logs/test/")
    parser.add_argument("-backend", type=str, default="auto",
                        choices=("auto", "fake", "native", "sumo"))
    parser.add_argument("-gui", type=str2bool, default=False)
    args = parser.parse_args(argv)

    runner = BaselineRunner(
        args.player, backend=args.backend, gui=args.gui, max_steps=args.max_s,
        log=args.log, log_step=args.log_s, log_dir=args.log_dir,
    )
    print("PLAY", args.player)
    episodes = args.max_e if args.max_e > 0 else 1_000_000_000
    runner.run(episodes)


if __name__ == "__main__":
    main()
