"""Device-protocol vs host-protocol snapshot ranking agreement.

The on-device evaluator (sim/eval_on_device.py) sweeps a snapshot dir in
one XLA program; the host sweep (scripts/eval_snapshots.py, via
eval_watch.sh) is the canonical protocol. Before the device sweep can be
trusted for SCREENING (pick which snapshots/seeds get host evaluation),
the two protocols' rankings must agree. This script joins the two
summary.csv tables per seed dir and reports Spearman rank correlation of
delay, plus whether the tail-guarded picks coincide.

Usage:
  python scripts/compare_eval_protocols.py \
      --host logs/rainbow/ms_probe/s7/sweep_summary.csv \
      --device /tmp/sweep_dev_s7/summary.csv [--label s7] ...
(repeat --host/--device pairs; pairs are matched positionally)
"""

import argparse
import sys


def spearman(a, b):
    import numpy as np

    def rank(x):
        order = np.argsort(x)
        r = np.empty(len(x))
        r[order] = np.arange(len(x), dtype=float)
        return r

    ra, rb = rank(np.asarray(a)), rank(np.asarray(b))
    ra -= ra.mean()
    rb -= rb.mean()
    denom = (ra ** 2).sum() ** 0.5 * (rb ** 2).sum() ** 0.5
    return float((ra * rb).sum() / denom) if denom else float("nan")


def main() -> None:
    import pandas as pd

    ap = argparse.ArgumentParser()
    ap.add_argument("--host", action="append", required=True)
    ap.add_argument("--device", action="append", required=True)
    ap.add_argument("--label", action="append", default=None)
    args = ap.parse_args()
    if len(args.host) != len(args.device):
        sys.exit("need matching --host/--device pairs")
    labels = args.label or [f"pair{i}" for i in range(len(args.host))]

    rows = []
    for label, h, d in zip(labels, args.host, args.device):
        hdf = pd.read_csv(h)
        ddf = pd.read_csv(d)
        m = hdf.merge(ddf, on="steps", suffixes=("_host", "_dev"))
        if len(m) < 3:
            print(f"{label}: only {len(m)} common snapshots — skipped")
            continue
        rho_delay = spearman(m["delay_host"], m["delay_dev"])
        # Round-3 host sweeps predate the tail-aware columns.
        rho_worst = (spearman(m["worst_host"], m["worst_dev"])
                     if "worst_host" in m else float("nan"))
        top_host = m.nsmallest(3, "delay_host")["steps"].tolist()
        top_dev = m.nsmallest(3, "delay_dev")["steps"].tolist()
        overlap = len(set(top_host) & set(top_dev))
        rows.append({"seed": label, "n": len(m), "rho_delay": rho_delay,
                     "rho_worst": rho_worst,
                     "top3_overlap": overlap,
                     "host_top3": top_host, "dev_top3": top_dev})
        print(f"{label}: n={len(m)} rho(delay)={rho_delay:+.3f} "
              f"rho(worst)={rho_worst:+.3f} top3 overlap {overlap}/3 "
              f"host{top_host} dev{top_dev}")
    if rows:
        import numpy as np

        print(f"\nmean rho(delay) over {len(rows)} seeds: "
              f"{np.mean([r['rho_delay'] for r in rows]):+.3f}")


if __name__ == "__main__":
    main()
