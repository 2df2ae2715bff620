"""Early-decidability screen: does a sub-30 snapshot by 500k predict tier?

Round-3 observation (BENCHMARKS.md "what the ~29 mode does"): every
~29-tier noisy-distributional seed had an eval-best snapshot at
250k-1M, and no ~31-tier seed ever showed a sub-30 snapshot. If that
rule holds out-of-sample, a multi-seed run only needs 500k steps per
seed before deciding which seeds to train to 2.1M — combined with the
vmapped multi-seed trainer (sim/train_multiseed.py) this turns seed
search into a screen-then-commit pipeline (~4x fewer chip-hours per
discovered ~29 seed).

This script evaluates the rule on any set of (sweep_summary.csv,
results CSV) pairs: screen+ = any snapshot with steps <= cutoff and
20-episode sweep delay < thresh; outcome+ = canonical 50-episode mean
delay < tier edge. Prints per-seed rows and the confusion matrix.
In-sample cases (round 3) and out-of-sample cases (r4a/r4b fresh
seeds) should be passed with different --case prefixes ('is:'/'oos:')
so the table separates them.

Usage:
  python scripts/early_screen.py \
      --case is:NoisyQrS2:logs/rainbow/noisyqr_s2/sweep_summary.csv:evaluation/results/results_DQNAgentNoisyQrS2.csv \
      --case oos:NoisyQrS7:logs/rainbow/ms_probe/s7/sweep_summary.csv:evaluation/results/results_DQNAgentNoisyQrS7.csv \
      [--cutoff 500000] [--thresh 30] [--tier-edge 29.7]
"""

import argparse
import csv


def sweep_min_below_cutoff(path, cutoff):
    """(min delay over snapshots with steps<=cutoff, its step, grid size)."""
    rows = []
    with open(path) as f:
        for r in csv.DictReader(f):
            s = float(r["steps"])
            if s <= cutoff:
                rows.append((float(r["delay"]), int(s)))
    if not rows:
        return None, None, 0
    best = min(rows)
    return best[0], best[1], len(rows)


def final_mean(path):
    with open(path) as f:
        vals = [float(r["avg_time_loss"]) for r in csv.DictReader(f)]
    return sum(vals) / len(vals), len(vals)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--case", action="append", required=True,
                    help="group:label:sweep_summary.csv:results.csv")
    ap.add_argument("--cutoff", type=float, default=500_000)
    ap.add_argument("--thresh", type=float, default=30.0)
    ap.add_argument("--tier-edge", type=float, default=29.7,
                    help="50-ep mean below this counts as the ~29 tier "
                         "(the observed gap is 29.02-29.34 vs 30.01+)")
    args = ap.parse_args()

    print(f"screen: min 20-ep sweep delay over snapshots <= "
          f"{args.cutoff:,.0f} steps < {args.thresh}; "
          f"outcome: 50-ep mean < {args.tier_edge}\n")
    header = (f"{'group':<4} {'seed':<12} {'min<=cut':>9} {'@step':>8} "
              f"{'grid':>4} {'screen':>7} {'final':>7} {'tier29':>7} {'ok':>3}")
    print(header)
    print("-" * len(header))
    confusion = {}
    for c in args.case:
        group, label, sweep, results = c.split(":")
        mind, atstep, ngrid = sweep_min_below_cutoff(sweep, args.cutoff)
        fin, n = final_mean(results)
        pred = mind is not None and mind < args.thresh
        actual = fin < args.tier_edge
        ok = pred == actual
        confusion.setdefault(group, [0, 0, 0, 0])
        # [TP, FP, FN, TN]
        idx = (0 if actual else 1) if pred else (2 if actual else 3)
        confusion[group][idx] += 1
        print(f"{group:<4} {label:<12} {mind:>9.2f} {atstep:>8,} "
              f"{ngrid:>4} {str(pred):>7} {fin:>7.2f} {str(actual):>7} "
              f"{'y' if ok else 'N':>3}")
    print()
    for g, (tp, fp, fn, tn) in confusion.items():
        n = tp + fp + fn + tn
        print(f"[{g}] n={n} TP={tp} FP={fp} FN={fn} TN={tn} "
              f"accuracy={(tp + tn) / n:.2f}")


if __name__ == "__main__":
    main()
