"""Snapshot sweep on the TPU: all packs x all episodes in one XLA program.

Device-protocol twin of scripts/eval_snapshots.py — same table, same
tail-guarded pick rule, ~two minutes for a 17-snapshot x 50-episode sweep
instead of ~6 hours of serial host sim (see sim/eval_on_device.py module
docstring for the protocol caveats; use the host sweep for the shipped
reference-protocol tables).

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/eval_snapshots_device.py \
      save/rainbow/ms_probe/s7/ [-n 50] [--algo NoisyQrDuelingDQNAgent] \
      [--workdir /tmp/snapshot_eval_device]

NOTE: this RUNS ON THE TPU — one TPU process at a time; don't start it
while a chip queue is training.
"""

import argparse
import glob
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("save_dir")
    ap.add_argument("-n", type=int, default=50)
    ap.add_argument("--master-seed", type=int, default=42)
    ap.add_argument("--obs-variant", default="hybrid")
    ap.add_argument("--algo", default=None)
    ap.add_argument("--workdir", default="/tmp/snapshot_eval_device")
    args = ap.parse_args()

    import pandas as pd

    from multimodal_drl_rmc_tpu.sim.eval_on_device import (
        DeviceEvaluator,
        write_results_csv,
    )

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
        raise SystemExit(f"save dir mixes algos {algos}; pass --algo")

    def step_of(p):
        m = re.search(r"_step(\d+)k_model\.pack$", p)
        return int(m.group(1)) * 1000 if m else float("inf")
    packs.sort(key=step_of)

    ev = DeviceEvaluator(n_episodes=args.n, master_seed=args.master_seed)
    all_rows = ev.evaluate(packs, obs_variant=args.obs_variant)
    df = pd.DataFrame(all_rows)

    os.makedirs(args.workdir, exist_ok=True)
    rows = []
    for pack in packs:
        sub = df[df.model_path == pack]
        tag = (f"Snap{step_of(pack) // 1000}k"
               if step_of(pack) != float("inf") else "SnapFinal")
        write_results_csv(sub.to_dict("records"),
                          os.path.join(args.workdir,
                                       f"results_device_{tag}.csv"))
        d = sub["avg_time_loss"]
        k = max(1, len(d) // 10)
        rows.append({
            "pack": os.path.basename(pack),
            "steps": step_of(pack),
            "TTT": sub["total_travel_time"].mean(),
            "delay": d.mean(),
            "worst": d.max(),
            "cvar10": d.nlargest(k).mean(),
            "throughput": sub["total_throughput"].mean(),
        })
        print(f"{rows[-1]['pack']}: TTT {rows[-1]['TTT']:,.0f} "
              f"delay {rows[-1]['delay']:.2f} worst {rows[-1]['worst']:.1f} "
              f"cvar10 {rows[-1]['cvar10']:.1f} "
              f"thr {rows[-1]['throughput']:,.0f}", flush=True)

    # Same tail-guarded rule as the host sweep (scripts/eval_snapshots.py).
    TAIL_SLACK = 10.0
    floor = min(r["worst"] for r in rows)
    guarded = [r for r in rows if r["worst"] <= floor + TAIL_SLACK]
    best = min(guarded, key=lambda r: r["delay"])
    best_mean = min(rows, key=lambda r: r["delay"])
    if best is not best_mean:
        print(f"\nmean-only pick {best_mean['pack']} REJECTED by tail guard "
              f"(worst {best_mean['worst']:.1f} > {floor:.1f} + {TAIL_SLACK})")
    print("\nbest by tail-guarded delay (device protocol):", best["pack"])
    pd.DataFrame(rows).to_csv(os.path.join(args.workdir, "summary.csv"),
                              index=False)


if __name__ == "__main__":
    main()
