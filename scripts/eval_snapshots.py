"""Evaluate every step-tagged snapshot pack from a long training run.

DeviceTrainer writes ``<Algo>_lr<lr>_step<N>k_model.pack`` snapshots every
SNAPSHOT_EVERY env steps (sim/train_on_device.py); this sweeps them (plus
the final pack) through the seeded eval harness and prints a
TTT/delay-vs-training-step table so the shipped checkpoint is the best
one, not just the last one.

Usage:
  python scripts/eval_snapshots.py save/r2_long/ [-n 20] [--obs-variant hybrid]
"""

import argparse
import glob
import os
import re
import subprocess
import sys

import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("save_dir")
    ap.add_argument("-n", type=int, default=20)
    ap.add_argument("--master-seed", type=int, default=42)
    ap.add_argument("--obs-variant", default="hybrid")
    ap.add_argument("--algo", default=None,
                    help="only sweep packs of this algo (required when the "
                         "save dir mixes algos — shared save/ layout)")
    ap.add_argument("--workdir", default="/tmp/snapshot_eval",
                    help="scratch dir for the per-snapshot eval CSVs + "
                         "summary.csv (give concurrent sweeps distinct "
                         "dirs or they clobber each other)")
    ap.add_argument("--noise", type=float, default=0.0,
                    help="driver-imperfection accel noise sigma — sweep "
                         "under the noise protocol (select checkpoints "
                         "under the protocol they will be deployed on)")
    args = ap.parse_args()

    packs = sorted(glob.glob(os.path.join(args.save_dir, "*_model.pack")))
    if not packs:
        raise SystemExit(f"no *_model.pack files under {args.save_dir}")

    def algo_of(p):
        m = re.match(r"(.+?)_lr", os.path.basename(p))
        return m.group(1) if m else "?"

    algos = sorted({algo_of(p) for p in packs})
    if args.algo:
        packs = [p for p in packs if algo_of(p) == args.algo]
        if not packs:
            raise SystemExit(f"no packs for algo {args.algo} "
                             f"(found: {', '.join(algos)})")
    elif len(algos) > 1:
        raise SystemExit(f"save dir mixes algos {algos}; pass --algo to "
                         "pick one (otherwise unrelated checkpoints would "
                         "share one sweep table)")

    def step_of(p):
        m = re.search(r"_step(\d+)k_model\.pack$", p)
        return int(m.group(1)) * 1000 if m else float("inf")  # final last
    packs.sort(key=step_of)

    algo = algo_of(packs[0])
    rows = []
    for pack in packs:
        tag = (f"{algo}Snap{step_of(pack) // 1000}k"
               if step_of(pack) != float("inf") else f"{algo}SnapFinal")
        cmd = [sys.executable, "evaluate.py", "-s", "DQNAgent",
               "-n", str(args.n), "--master-seed", str(args.master_seed),
               "--backend", "native", "--obs-variant", args.obs_variant,
               "-d", pack, "--tag", tag,
               "-o", args.workdir, "--noise", str(args.noise)]
        # Force CPU: drop the axon sitecustomize from PYTHONPATH (with it
        # present, even empty JAX_PLATFORMS selects the TPU and the eval
        # would block behind a concurrent training job).
        env = {**os.environ, "JAX_PLATFORMS": "", "PYTHONPATH": ""}
        proc = subprocess.run(cmd, cwd=REPO, env=env,
                              capture_output=True, text=True)
        if proc.returncode != 0:
            sys.stderr.write(proc.stderr[-4000:])
            raise SystemExit(f"evaluate.py failed for {pack} "
                             f"(rc={proc.returncode})")
        df = pd.read_csv(os.path.join(args.workdir, f"results_DQNAgent{tag}.csv"))
        d = df["avg_time_loss"]
        k = max(1, len(d) // 10)
        rows.append({
            "pack": os.path.basename(pack),
            "steps": step_of(pack),
            "TTT": df["total_travel_time"].mean(),
            "delay": d.mean(),
            "worst": d.max(),
            "cvar10": d.nlargest(k).mean(),
            "throughput": df["total_throughput"].mean(),
        })
        print(f"{rows[-1]['pack']}: TTT {rows[-1]['TTT']:,.0f} "
              f"delay {rows[-1]['delay']:.2f} "
              f"worst {rows[-1]['worst']:.1f} cvar10 {rows[-1]['cvar10']:.1f} "
              f"thr {rows[-1]['throughput']:,.0f}", flush=True)
    # Tail-guarded selection: best mean delay among snapshots whose worst
    # episode stays within TAIL_SLACK of the sweep's lowest worst episode.
    # Rationale (BENCHMARKS.md held-out table): mean-only selection shipped
    # agents with 87-106 s/veh catastrophic modes that only showed up
    # off-protocol — a snapshot whose IN-protocol tail is already an
    # outlier is the canary. Falls back to the mean pick if the guard
    # empties the candidate set (it cannot: the min-worst row qualifies).
    TAIL_SLACK = 10.0   # s/veh above the sweep's best worst-episode
    floor = min(r["worst"] for r in rows)
    guarded = [r for r in rows if r["worst"] <= floor + TAIL_SLACK]
    best = min(guarded, key=lambda r: r["delay"])
    best_mean = min(rows, key=lambda r: r["delay"])
    if best is not best_mean:
        print(f"\nmean-only pick {best_mean['pack']} REJECTED by tail guard "
              f"(worst {best_mean['worst']:.1f} > {floor:.1f} + {TAIL_SLACK})")
    print("\nbest by tail-guarded delay:", best["pack"])
    pd.DataFrame(rows).to_csv(os.path.join(args.workdir, "summary.csv"),
                              index=False)


if __name__ == "__main__":
    main()
