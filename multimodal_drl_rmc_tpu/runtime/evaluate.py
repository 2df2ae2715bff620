"""Seeded multi-episode evaluation benchmark.

Behavioral port target: reference ``evaluate.py`` — per episode
seed = master_seed + i, a FRESH env per episode, per-cycle CSV logging,
then merge of scenario info + tripinfo stats + sumo-log stats + framework
CSV stats into one row of ``results_<Strategy>.csv`` (:24-106). The output
schema matches the reference's checked-in results files (BASELINE.md).

Backends without SUMO artifacts (fake, native C++ sim) supply their
tripinfo-equivalent aggregates via ``TrafficBackend.episode_artifacts()``;
the SUMO backend exposes the real tripinfo.xml/log paths and both flow
through the same parsers."""

from __future__ import annotations

import argparse
import os

import pandas as pd

from ..config import Config
from ..envs.baselines import BASELINES
from ..evaluation.parsers import (
    parse_framework_log,
    parse_sumo_log,
    parse_tripinfo_for_episode_stats,
)
from .rollout import BaselineRunner, PolicyRunner

STRATEGIES = ("DQNAgent",) + tuple(BASELINES.keys())


def _episode_stats(runner, framework_log_path: str, spillback_threshold: float) -> dict:
    backend = runner.inner.get_env().sim_env.backend
    artifacts = backend.episode_artifacts()
    stats: dict = {}
    tripinfo = artifacts.get("tripinfo_xml")
    if tripinfo and os.path.isfile(tripinfo):
        stats.update(parse_tripinfo_for_episode_stats(tripinfo))
    elif artifacts.get("trip_stats"):
        stats.update(artifacts["trip_stats"])
    sumo_log = artifacts.get("sumo_log")
    if sumo_log and os.path.isfile(sumo_log):
        stats.update(parse_sumo_log(sumo_log))
    elif artifacts.get("sim_log_stats"):
        stats.update(artifacts["sim_log_stats"])
    stats.update(parse_framework_log(framework_log_path, spillback_threshold))
    return stats


def evaluate_strategy(
    strategy: str,
    *,
    num_episodes: int = 10,
    master_seed: int = 42,
    model_path: str | None = None,
    output_dir: str = "./evaluation/results/",
    backend: str = "auto",
    obs_variant: str = "hybrid",
    cfg: Config | None = None,
    spillback_threshold: float = 20.0,
    pen_rate: float | None = None,
    tag: str = "",
    noise: float = 0.0,
    guard_occ: float = 0.0,
    guard_cap: int = 3,
) -> pd.DataFrame:
    """``pen_rate`` freezes the CV penetration draw for the detection
    ablation (reference: full detection puts ~all vehicles in the connected
    class, sumo_env.py:586-594; partial keeps the training draw :597-602).
    ``tag`` suffixes the results CSV name (results_<Strategy><tag>.csv).
    ``noise`` > 0 sets scenario.accel_noise_sigma — the driver-imperfection
    stress protocol (BENCHMARKS "Driver-noise mode"); noise-mode numbers
    are comparable only to other noise-mode numbers."""
    if pen_rate is not None or noise > 0.0:
        import dataclasses

        cfg = cfg or Config()
        scen = cfg.env.scenario
        if pen_rate is not None:
            scen = dataclasses.replace(
                scen, con_penetration_rate_range=(pen_rate, pen_rate))
        if noise > 0.0:
            scen = dataclasses.replace(scen, accel_noise_sigma=noise)
        cfg = cfg.replace(env=dataclasses.replace(cfg.env, scenario=scen))
    os.makedirs(output_dir, exist_ok=True)
    rows = []
    sumo_log_path = os.path.join(output_dir, f"temp_sumo_log_{strategy}{tag}.log")

    for episode in range(num_episodes):
        seed = master_seed + episode
        # SUMO backend side channel (reference evaluate.py:56-58 /
        # sumo_env.py:149-150).
        os.environ["SUMO_EVAL_SEED"] = str(seed)
        os.environ["SUMO_EVAL_LOG_FILE"] = sumo_log_path

        if strategy == "DQNAgent":
            if not model_path:
                raise ValueError("model_path is required for DQNAgent")
            runner = PolicyRunner(
                model_path, backend=backend, obs_variant=obs_variant, cfg=cfg,
                log=True, log_step=1, log_dir=output_dir + "/",
                guard_occ=guard_occ, guard_cap=guard_cap,
            )
            framework_log = os.path.join(
                output_dir, model_path.split("/")[-1].split("_model.pack")[0]
            )
        else:
            runner = BaselineRunner(
                strategy, backend=backend, cfg=cfg,
                log=True, log_step=1, log_dir=output_dir + "/",
            )
            framework_log = os.path.join(output_dir, strategy)

        runner.run_episode(seed=seed)
        scenario_info = runner.get_scenario_info()
        stats = _episode_stats(runner, framework_log, spillback_threshold)
        runner.close()

        rows.append({"episode_id": episode, "seed": seed, **scenario_info, **stats})
        for path in (sumo_log_path, framework_log):
            if os.path.exists(path):
                os.remove(path)
        print(f"[{strategy}] episode {episode + 1}/{num_episodes} done")

    df = pd.DataFrame(rows)
    out_csv = os.path.join(output_dir, f"results_{strategy}{tag}.csv")
    df.to_csv(out_csv, index=False, float_format="%.4f")
    print(f"results -> {out_csv}")
    return df


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description="EVALUATE")
    parser.add_argument("-s", "--strategy", required=True, choices=STRATEGIES)
    parser.add_argument("-n", "--num-episodes", type=int, default=10)
    parser.add_argument("--master-seed", type=int, default=42)
    parser.add_argument("-d", "--model-path", type=str, default=None)
    parser.add_argument("-o", "--output-dir", type=str, default="./evaluation/results/")
    parser.add_argument("-g", "--gpu", type=str, default="0", help="ignored (TPU build)")
    parser.add_argument("--backend", type=str, default="auto",
                        choices=("auto", "fake", "native", "sumo"))
    parser.add_argument("--obs-variant", type=str, default="hybrid",
                        choices=("hybrid", "macro_lane", "macro_no_lane"))
    parser.add_argument("--pen-rate", type=float, default=None,
                        help="freeze the CV penetration rate (detection "
                             "ablation); default keeps the training draw")
    parser.add_argument("--tag", type=str, default="",
                        help="suffix for the results CSV name")
    parser.add_argument("--noise", type=float, default=0.0,
                        help="driver-imperfection accel noise sigma (m/s^2); "
                             "stress protocol, see BENCHMARKS")
    parser.add_argument("--guard-occ", type=float, default=0.0,
                        help="safety envelope: cap greens while the previous "
                             "cycle's merge occupancy exceeds this percent "
                             "(0 = off; 17 = ALINEA's occ_crit)")
    parser.add_argument("--guard-cap", type=int, default=3,
                        help="max action index while the guard is active "
                             "(3 = 20 s green)")
    args = parser.parse_args(argv)
    evaluate_strategy(
        args.strategy,
        num_episodes=args.num_episodes,
        master_seed=args.master_seed,
        model_path=args.model_path,
        output_dir=args.output_dir,
        backend=args.backend,
        obs_variant=args.obs_variant,
        pen_rate=args.pen_rate,
        tag=args.tag,
        noise=args.noise,
        guard_occ=args.guard_occ,
        guard_cap=args.guard_cap,
    )


if __name__ == "__main__":
    main()
