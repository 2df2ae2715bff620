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

Screen v2 (round 5, VERDICT #2): an optional 5th field per case names a
HELD-OUT screen window (20 episodes on seeds 142+ at the screen
snapshot, `evaluation/results_screen_holdout/`). Retro-validation on
the 8 testable screen-positives showed the window separates the
touched-and-degenerate false positives — all 3 FPs (NoisyIqn s6/s7,
NoisyQr s13) collapse in it (1-2 episodes >60 s/veh) while 4/5 true
positives are clean — but one TRUE positive (NoisyQr s10, final 29.44)
also collapses there, so a hard cat==0 gate trades recall 6/6 -> 5/6
for precision 5/5. Since a lost ~29 seed costs far more than an FP's
~18-min continuation, v2 keeps the v1 criterion as the CONTINUE gate
and uses the held-out window as a deployability TIER: clean-positive
(holdout cat==0; 4/4 reached the ~29 tier) continues with priority;
razor-positive (holdout cat>0; 1/4) continues only when chip budget
allows, and its final pick must clear the full 50-episode held-out
tail protocol before deployment regardless of tier.

Usage:
  python scripts/early_screen.py \
      --case is:NoisyQrS2:logs/rainbow/noisyqr_s2/sweep_summary.csv:evaluation/results/results_DQNAgentNoisyQrS2.csv[:evaluation/results_screen_holdout/results_DQNAgentScreenQrS2.csv] \
      [--cutoff 500000] [--thresh 30] [--tier-edge 29.7] [--cat 60]
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


def holdout_stats(path, cat_thresh):
    """(mean, worst, catastrophic count) over a held-out screen window."""
    with open(path) as f:
        vals = [float(r["avg_time_loss"]) for r in csv.DictReader(f)]
    return (sum(vals) / len(vals), max(vals),
            sum(1 for v in vals if v > cat_thresh))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--case", action="append", required=True,
                    help="group:label:sweep_summary.csv:results.csv")
    ap.add_argument("--cutoff", type=float, default=500_000)
    ap.add_argument("--thresh", type=float, default=30.0)
    ap.add_argument("--tier-edge", type=float, default=29.7,
                    help="50-ep mean below this counts as the ~29 tier "
                         "(the observed gap is 29.02-29.34 vs 30.01+)")
    ap.add_argument("--cat", type=float, default=60.0,
                    help="held-out screen-window episodes above this are "
                         "catastrophic (razor tier)")
    args = ap.parse_args()

    print(f"screen: min 20-ep sweep delay over snapshots <= "
          f"{args.cutoff:,.0f} steps < {args.thresh}; "
          f"outcome: 50-ep mean < {args.tier_edge}\n")
    header = (f"{'group':<4} {'seed':<12} {'min<=cut':>9} {'@step':>8} "
              f"{'grid':>4} {'screen':>7} {'final':>7} {'tier29':>7} {'ok':>3}"
              f" {'ho-cat':>6} {'v2tier':>7}")
    print(header)
    print("-" * len(header))
    confusion = {}
    v2 = {}   # tier -> [reached ~29, did not]
    for c in args.case:
        parts = c.split(":")
        group, label, sweep, results = parts[:4]
        holdout = parts[4] if len(parts) > 4 else None
        mind, atstep, ngrid = sweep_min_below_cutoff(sweep, args.cutoff)
        fin, n = final_mean(results)
        pred = mind is not None and mind < args.thresh
        actual = fin < args.tier_edge
        ok = pred == actual
        confusion.setdefault(group, [0, 0, 0, 0])
        # [TP, FP, FN, TN]
        idx = (0 if actual else 1) if pred else (2 if actual else 3)
        confusion[group][idx] += 1
        hocat, tier = "", ""
        if holdout is not None and pred:
            _, _, ncat = holdout_stats(holdout, args.cat)
            hocat = str(ncat)
            tier = "clean" if ncat == 0 else "razor"
            v2.setdefault(tier, [0, 0])
            v2[tier][0 if actual else 1] += 1
        print(f"{group:<4} {label:<12} {mind:>9.2f} {atstep:>8,} "
              f"{ngrid:>4} {str(pred):>7} {fin:>7.2f} {str(actual):>7} "
              f"{'y' if ok else 'N':>3} {hocat:>6} {tier:>7}")
    print()
    for g, (tp, fp, fn, tn) in confusion.items():
        n = tp + fp + fn + tn
        print(f"[{g}] n={n} TP={tp} FP={fp} FN={fn} TN={tn} "
              f"accuracy={(tp + tn) / n:.2f}")
    if v2:
        print("\nv2 deployability tiers over screen-positives with a "
              "held-out window:")
        for tier in ("clean", "razor"):
            if tier in v2:
                hit, miss = v2[tier]
                print(f"  {tier}-positive: {hit}/{hit + miss} reached the "
                      f"~29 tier")
        print("  (v2 keeps the v1 continue gate — a hard holdout-cat==0 "
              "gate would score precision "
              f"{v2.get('clean', [0, 0])[0]}/{sum(v2.get('clean', [0, 0]))} "
              "but lose recall on razor true positives)")


if __name__ == "__main__":
    main()
