"""Large-N tail certification of deployment candidates on the TPU.

The held-out protocol (50 host episodes) bounds a candidate's worst
episode at n=50 — it cannot see a 1-in-200 collapse mode at all. The
on-device evaluator makes the episode count a free parameter: 1000
fresh-demand episodes of one policy are a single ~1000-env XLA program
(~minutes on a v5e vs ~7 h of host sim, and the reference's SUMO could
not finish it in two days). Reports mean / p95 / p99 / CVaR@10 / worst
delay per candidate under the device protocol, paired across candidates.

Positional args may mix pack paths and classical-strategy names
(AlwaysGreenBaseline / FixedCycleBaseline / AlineaDsBaseline /
PiAlineaDsBaseline) — the classical controllers run on the device
protocol via DeviceEvaluator.evaluate_strategy over the SAME episode
keys, giving the table its classical bars.

Usage (chip must be idle):
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/tail_cert_device.py \
      -n 1000 --master-seed 1042 --out evaluation/results_tailcert \
      save/1ramp_1x3/NoisyIqnDuelingDQNAgent_lr5e-05_model.pack \
      FixedCycleBaseline AlineaDsBaseline [more...]
"""

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("packs", nargs="+")
    ap.add_argument("-n", type=int, default=1000)
    ap.add_argument("--master-seed", type=int, default=1042)
    ap.add_argument("--obs-variant", default="hybrid")
    ap.add_argument("--out", default="evaluation/results_tailcert")
    ap.add_argument("--noise", type=float, default=0.0,
                    help="driver-imperfection accel noise sigma (m/s^2); "
                         "device-sim noise certs are a distinct protocol "
                         "(BENCHMARKS 'Driver-noise mode') — keep their "
                         "--out separate from the sigma=0 certs")
    ap.add_argument("--guard-occ", type=float, default=0.0,
                    help="safety envelope trigger (percent occupancy; "
                         "0 = off) — mirrors evaluate.py --guard-occ")
    ap.add_argument("--guard-cap", type=int, default=3)
    args = ap.parse_args()

    import numpy as np
    import pandas as pd

    from multimodal_drl_rmc_tpu.runtime.rollout import infer_spec_for_pack
    from multimodal_drl_rmc_tpu.sim.eval_on_device import (
        DeviceEvaluator,
        write_results_csv,
    )

    from multimodal_drl_rmc_tpu.envs.baselines import BASELINES

    cfg = None
    if args.noise > 0.0:
        import dataclasses

        from multimodal_drl_rmc_tpu.config import Config

        cfg = Config()
        cfg = cfg.replace(env=dataclasses.replace(
            cfg.env, scenario=dataclasses.replace(
                cfg.env.scenario, accel_noise_sigma=args.noise)))
    ev = DeviceEvaluator(cfg=cfg, n_episodes=args.n,
                         master_seed=args.master_seed,
                         guard_occ=args.guard_occ, guard_cap=args.guard_cap)
    # Group same-spec packs so each group is one stacked program; packs of
    # different head types run as separate programs over the SAME episode
    # keys (still paired — the reset keys depend only on master_seed).
    # Classical-strategy names each run as their own program, same keys.
    groups: dict = {}
    for p in args.packs:
        key = p if p in BASELINES else infer_spec_for_pack(p, args.obs_variant)
        groups.setdefault(key, []).append(p)

    os.makedirs(args.out, exist_ok=True)
    summary = []
    for spec, packs in groups.items():
        rows = (ev.evaluate_strategy(spec) if isinstance(spec, str)
                else ev.evaluate(packs, obs_variant=args.obs_variant))
        df = pd.DataFrame(rows)
        for p, sub in df.groupby("model_path"):
            d = np.asarray(sub["avg_time_loss"])
            k = max(1, len(d) // 10)
            name = os.path.basename(p).replace("_model.pack", "")
            tag = p.split("/")[-2] if "/" in p else ""
            write_results_csv(
                sub.to_dict("records"),
                os.path.join(args.out, f"results_device_{tag}_{name}.csv"))
            summary.append({
                "pack": p, "episodes": len(d),
                "delay_mean": d.mean(), "delay_p95": np.percentile(d, 95),
                "delay_p99": np.percentile(d, 99),
                "cvar10": np.sort(d)[-k:].mean(), "worst": d.max(),
                "thr_mean": sub["total_throughput"].mean(),
                "spillback_frac": (sub["total_spillback_time_sec"] > 0).mean(),
            })
            s = summary[-1]
            print(f"{p}\n  n={s['episodes']} delay {s['delay_mean']:.2f} "
                  f"p95 {s['delay_p95']:.1f} p99 {s['delay_p99']:.1f} "
                  f"cvar10 {s['cvar10']:.1f} worst {s['worst']:.1f} "
                  f"thr {s['thr_mean']:,.0f} "
                  f"spill-episodes {100*s['spillback_frac']:.1f}%", flush=True)
    # Merge into any existing summary so successive certification runs
    # (agents one day, classical bars the next) accumulate instead of
    # clobbering each other; a re-run of the same pack replaces its row.
    out_csv = os.path.join(args.out, "summary.csv")
    df = pd.DataFrame(summary)
    if os.path.exists(out_csv):
        prev = pd.read_csv(out_csv)
        df = pd.concat([prev[~prev["pack"].isin(df["pack"])], df],
                       ignore_index=True)
    df.to_csv(out_csv, index=False)


if __name__ == "__main__":
    main()
