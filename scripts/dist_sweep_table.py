"""Consolidate the NoisyNet + distributional-sweep snapshot evaluations
into one markdown table (VERDICT r2 item 7 closure evidence).

Reads each config's ``sweep_summary.csv`` (written by
scripts/eval_dist_sweep.sh -> scripts/eval_snapshots.py: 20 seeded
episodes per checkpoint, native backend), picks the eval-best checkpoint
by delay (never by training reward, CLAUDE.md), and prints a markdown
table sorted by delay. Run on CPU: JAX not needed.

Usage: python scripts/dist_sweep_table.py
"""

from __future__ import annotations

import os

import pandas as pd

CONFIGS = [
    ("noisy", "NoisyNet (sigma0 0.5) + PER + n-step 3"),
    ("dist_sweep/c51_a31", "C51, 31 atoms, support [-30, 45]"),
    ("dist_sweep/c51_wide", "C51, 51 atoms, support [-45, 60]"),
    ("dist_sweep/c51_lr5", "C51, 51 atoms, lr 5e-5"),
    ("dist_sweep/qr_k32", "QR, 32 quantiles"),
    ("dist_sweep/qr_lr5", "QR, 51 quantiles, lr 5e-5"),
    # Full-Rainbow round (scripts/run_rainbow.sh, 250k snapshot grid).
    ("rainbow/noisyqr_lr5", "Noisy + QR 51, lr 5e-5 (full Rainbow)"),
    ("rainbow/qr_lr5_s1", "QR, 51 quantiles, lr 5e-5, seed 1"),
    ("rainbow/noisyc51_lr5", "Noisy + C51 [-45,60], lr 5e-5 (Rainbow)"),
    ("rainbow/iqn_lr5", "IQN, 51 tau samples, lr 5e-5"),
    # save/noisy above is already seed 1; the extra robustness seeds are
    # 2 and 3 (run_rainbow2.sh).
    ("rainbow/noisy_s2", "NoisyNet (sigma0 0.5), seed 2"),
    ("rainbow/noisy_s3", "NoisyNet (sigma0 0.5), seed 3"),
    # Late round-3 chip queues (r3b/r3c/r3d).
    ("rainbow/noisyqr63", "Noisy + QR 51, lr 5e-5, 6.3M budget"),
    ("rainbow/noisyiqn_lr5", "Noisy + IQN 51, lr 5e-5 (full Rainbow)"),
    ("rainbow/noisyqr_s2", "Noisy + QR 51, lr 5e-5, seed 2"),
    ("rainbow/noisyqr_s3", "Noisy + QR 51, lr 5e-5, seed 3"),
    ("rainbow/iqn_s2", "IQN, 51 tau samples, lr 5e-5, seed 2"),
    ("rainbow/noisyiqn_s2", "Noisy + IQN 51, lr 5e-5, seed 2"),
]


def main() -> None:
    rows = []
    for d, label in CONFIGS:
        path = os.path.join("logs", d, "sweep_summary.csv")
        if not os.path.exists(path):
            print(f"(pending: {path})")
            continue
        t = pd.read_csv(path)
        best = t.loc[t["delay"].idxmin()]
        steps = ("final" if best["steps"] == float("inf")
                 else f"{best['steps'] / 1e6:g}M")  # 0.25M, 1M, 2M
        rows.append({
            "config": label, "best ckpt": steps,
            "TTT": f"{best['TTT']:,.0f}", "delay": f"{best['delay']:.2f}",
            "throughput": f"{best['throughput']:,.0f}",
        })
    if not rows:
        return
    out = pd.DataFrame(rows).sort_values("delay")
    print(out.to_markdown(index=False))


if __name__ == "__main__":
    main()
