"""Static-green stability map: collapse rate per (main flow, green) cell.

Round 4 found the device (JAX/IDM) and native (C++) sims place the
main=6000 stability edge on opposite sides of green-30 (BENCHMARKS
"Large-N device-protocol tail certification"): host-protocol-selected
razor-edge policies collapse on device episodes at that cell. This tool
charts the WHOLE edge on both simulators — for every (main_vph, green)
cell it rolls E fixed-demand episodes under the constant-green policy
and reports mean delay and catastrophe rate (episode delay > 60 s/veh).
The two maps are the calibration target: cells where the maps disagree
are exactly where cross-protocol policy transfer is razor-edged.

Usage:
  # native/C++ map (CPU; ~20-40 min at E=8 — run when the core is free)
  JAX_PLATFORMS='' python scripts/stability_map.py --backend native -e 8
  # device map (ONE vmapped XLA program; needs the chip free)
  python scripts/stability_map.py --backend device --tpu -e 8

Writes evaluation/stability_map_<backend>.csv and prints the grid.
"""

from __future__ import annotations

import argparse
import csv
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

MAINS = (4000, 4500, 5000, 5500, 6000, 6500)
GREENS = (15.0, 20.0, 25.0, 30.0, 35.0, 40.0)
CATASTROPHE = 60.0  # s/veh episode delay
PEN = 0.5           # fixed mid-range CV penetration (only affects obs)


def device_map(e: int, tpu: bool, mains, greens):
    import jax

    if not tpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from multimodal_drl_rmc_tpu.config import (Config, EnvConfig,
                                               ScenarioConfig)
    from multimodal_drl_rmc_tpu.sim.core import default_block
    from multimodal_drl_rmc_tpu.sim.env import DeviceRampEnv

    cfg0 = Config()
    acts = list(cfg0.env.green_time_actions_sec)
    cycles = int(cfg0.env.scenario.episode_seconds
                 // cfg0.env.cycle_seconds)
    rows = []
    for main in mains:
        # One batched program per main level (demand is drawn at reset
        # from the scenario table, so the table must be degenerate).
        scen = ScenarioConfig(
            veh_per_hour_main=(main,), veh_per_hour_main_weights=(1.0,),
            con_penetration_rate_range=(PEN, PEN),
            episode_seconds=(cycles + 1) * cfg0.env.cycle_seconds)
        B = len(greens) * e
        while B % default_block():
            B += 1
        env = DeviceRampEnv(EnvConfig(**{**cfg0.env.__dict__,
                                         "scenario": scen}), B)
        # env j of the batch runs green greens[j // e] (pad envs repeat
        # the last green and are dropped).
        aidx = np.full(B, acts.index(greens[-1]), np.int32)
        for j, g in enumerate(greens):
            aidx[j * e:(j + 1) * e] = acts.index(g)
        keys = jax.random.split(jax.random.PRNGKey(42), e)
        keys = jnp.tile(keys, (B // e + 1, 1))[:B]  # same draws per green

        @jax.jit
        def roll(actions):
            states = env._reset(keys)

            def body(states, _):
                states, _ = env.step(states, actions)
                return states, None

            states, _ = jax.lax.scan(body, states, None, length=cycles)
            return states.sim

        sim = roll(jnp.asarray(aidx))
        loss = np.asarray(sim.loss_sum).sum(axis=1)
        arr = np.asarray(sim.arrived).sum(axis=1)
        d = loss / np.maximum(arr, 1.0)
        for j, g in enumerate(greens):
            dj = d[j * e:(j + 1) * e]
            rows.append({"main_vph": main, "green_s": g,
                         "delay_mean": float(dj.mean()),
                         "delay_worst": float(dj.max()),
                         "collapse_rate": float((dj > CATASTROPHE).mean()),
                         "episodes": e})
        print(f"main {main}: " + " ".join(
            f"g{int(g)}={r['delay_mean']:.0f}"
            f"({int(r['collapse_rate'] * e)}/{e})"
            for g, r in zip(greens, rows[-len(greens):])), flush=True)
    return rows


def native_map(e: int, mains, greens):
    import dataclasses

    import numpy as np

    from multimodal_drl_rmc_tpu.config import Config, ScenarioConfig
    from multimodal_drl_rmc_tpu.runtime.rollout import PolicyRunner
    from multimodal_drl_rmc_tpu.runtime import evaluate as ev

    cfg0 = Config()
    acts = list(cfg0.env.green_time_actions_sec)
    pack = "save/1ramp_1x3/PerDuelingDoubleDQNAgent_lr0.0001_model.pack"
    orig = PolicyRunner.action
    rows = []
    try:
        for main in mains:
            scen = ScenarioConfig(
                veh_per_hour_main=(main,), veh_per_hour_main_weights=(1.0,),
                con_penetration_rate_range=(PEN, PEN))
            cfg = cfg0.replace(env=dataclasses.replace(cfg0.env,
                                                       scenario=scen))
            for g in greens:
                PolicyRunner.action = (
                    lambda self, obs, _a=acts.index(g): _a)
                df = ev.evaluate_strategy(
                    "DQNAgent", num_episodes=e, master_seed=42,
                    model_path=pack, backend="native", cfg=cfg,
                    output_dir="/tmp/stability_map",
                    tag=f"M{main}G{int(g)}")
                d = np.asarray(df["avg_time_loss"], float)
                rows.append({"main_vph": main, "green_s": g,
                             "delay_mean": float(d.mean()),
                             "delay_worst": float(d.max()),
                             "collapse_rate": float((d > CATASTROPHE).mean()),
                             "episodes": e})
                print(f"main {main} g{int(g)}: {d.mean():.1f} "
                      f"({int((d > CATASTROPHE).sum())}/{e})", flush=True)
    finally:
        PolicyRunner.action = orig
    return rows


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--backend", choices=("native", "device"),
                    required=True)
    ap.add_argument("-e", type=int, default=8, help="episodes per cell")
    ap.add_argument("--tpu", action="store_true",
                    help="device backend: allow the TPU (default CPU)")
    ap.add_argument("--mains", default=",".join(map(str, MAINS)))
    ap.add_argument("--greens", default=",".join(str(int(g)) for g in GREENS))
    ap.add_argument("-o", default=None)
    args = ap.parse_args(argv)
    mains = [int(m) for m in args.mains.split(",") if m]
    greens = [float(g) for g in args.greens.split(",") if g]

    rows = (device_map(args.e, args.tpu, mains, greens)
            if args.backend == "device" else
            native_map(args.e, mains, greens))

    out = args.o or f"evaluation/stability_map_{args.backend}.csv"
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    with open(out, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0]))
        w.writeheader()
        w.writerows(rows)
    print(f"\nmap -> {out}")
    print(f"{'main':>6} | " + " ".join(f"g{int(g):>2}" for g in greens)
          + "   (collapse rate)")
    for m in mains:
        cells = [r for r in rows if r["main_vph"] == m]
        print(f"{m:>6} | " + " ".join(
            f"{r['collapse_rate']:.2f}" for r in cells))


if __name__ == "__main__":
    main()
