"""Static comparison plots from results_<Strategy>.csv files.

The reference ships ~70 notebook-generated comparison plots under
`evaluation/results/plots/` (reference evaluatiom.ipynb outputs,
SURVEY.md §1 L6); this is the equivalent generator for this framework's
results. Produces:

  * strategy_comparison.png — per-metric small multiples (means over the
    seeded episodes), one hue with the DQN rows accented;
  * paired_differences.png — per-seed paired TTT/delay differences vs
    FixedCycle with 95% CIs (same demand draws per seed, so the paired
    comparison cancels demand variance).

Usage: python evaluation/plots.py [results_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import pandas as pd  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from summarize import main as summarize, paired  # noqa: E402

# Validated light-mode palette (dataviz reference instance).
ACCENT = "#2a78d6"     # DQN rows
NEUTRAL = "#b9b8b2"    # classical baselines
BETTER = "#2a78d6"     # improvement vs base (negative diff)
WORSE = "#eb6834"      # regression vs base
INK = "#0b0b0b"
INK2 = "#52514e"

PANELS = [
    ("TTT (s)", "Total travel time (s)"),
    ("Avg delay (s/veh)", "Avg delay (s/veh)"),
    ("Spillback (s)", "Spillback time (s)"),
    ("Merge speed (m/s)", "Merge speed (m/s)"),
    ("CO2 (mg)", "Total CO2 (mg)"),
    ("Throughput (veh)", "Throughput (veh)"),
]

SHORT = {
    "AlwaysGreenBaseline": "No control",
    "FixedCycleBaseline": "FixedCycle",
    "AlineaDsBaseline": "ALINEA",
    "PiAlineaDsBaseline": "PI-ALINEA",
    "DQNAgent": "DQN hybrid",
    "DQNAgentLong": "DQN PER n-step 3, 6.3M",
    "DQNAgentNStep3": "DQN n-step 3",
    "DQNAgentPer": "DQN + PER",
    "DQNAgentMacroLane": "DQN macro-lane",
    "DQNAgentMacroNoLane": "DQN macro-no-lane",
    "DQNAgentC51": "DQN C51 (exp.)",
    "DQNAgentQr": "DQN QR (exp.)",
    "DQNAgentNoisy": "DQN NoisyNet",
}


def _compact(v, _pos, label=False):
    """Tick/label formatter: 1.31B / 452k / 33.5."""
    a = abs(v)
    if a >= 1e9:
        return f"{v / 1e9:.2f}B"
    if a >= 1e6:
        return f"{v / 1e6:,.0f}M"
    if a >= 1e4:
        return f"{v / 1e3:,.0f}k"
    if a >= 100:
        return f"{v:,.0f}"
    return f"{v:.2f}" if label else f"{v:g}"


def _style(ax):
    ax.spines[["top", "right"]].set_visible(False)
    ax.spines[["left", "bottom"]].set_color(INK2)
    ax.tick_params(colors=INK2, labelsize=8)
    ax.xaxis.grid(True, color="#e8e7e2", linewidth=0.6)
    ax.set_axisbelow(True)


def strategy_comparison(table: pd.DataFrame, out: str) -> None:
    rows = table[table["strategy"].isin(SHORT)].copy()
    rows["label"] = rows["strategy"].map(SHORT)
    fig, axes = plt.subplots(2, 3, figsize=(13, 6.5))
    for ax, (col, title) in zip(axes.flat, PANELS):
        if col not in rows:
            ax.set_visible(False)
            continue
        sub = rows.dropna(subset=[col])
        if sub.empty:
            ax.set_visible(False)
            continue
        colors = [ACCENT if s.startswith("DQN") else NEUTRAL
                  for s in sub["strategy"]]
        y = range(len(sub))
        ax.barh(y, sub[col], color=colors, height=0.62)
        ax.set_yticks(list(y), sub["label"], fontsize=8, color=INK)
        ax.invert_yaxis()
        ax.set_title(title, fontsize=9.5, color=INK, loc="left")
        _style(ax)
        hi = sub[col].max()
        ax.set_xlim(0.0, hi * 1.18)   # zero-based bars, room for labels
        ax.xaxis.set_major_formatter(matplotlib.ticker.FuncFormatter(_compact))
        ax.xaxis.set_major_locator(matplotlib.ticker.MaxNLocator(5))
        for yi, v in zip(y, sub[col]):
            ax.text(v, yi, " " + _compact(v, None, label=True),
                    va="center", fontsize=7, color=INK2)
    fig.suptitle("Ramp-metering strategies, seeded evaluation means "
                 "(native backend)", fontsize=11, color=INK, x=0.01,
                 ha="left")
    fig.tight_layout(rect=(0, 0, 1, 0.96))
    fig.savefig(out, dpi=150)
    plt.close(fig)
    return out


def paired_differences(ptable: pd.DataFrame, out: str,
                       base_label: str = "FixedCycle") -> None:
    rows = ptable[ptable["strategy"].isin(SHORT)].copy()
    rows["label"] = rows["strategy"].map(SHORT)
    panels = [("dTTT", "Paired ΔTTT (s) vs " + base_label),
              ("dDelay", "Paired Δdelay (s/veh) vs " + base_label)]
    fig, axes = plt.subplots(1, 2, figsize=(11, 0.55 * len(rows) + 1.6))
    for ax, (key, title) in zip(axes, panels):
        sub = rows.sort_values(f"{key} mean")
        y = range(len(sub))
        for yi, (_, r) in zip(y, sub.iterrows()):
            m, ci = r[f"{key} mean"], r[f"{key} ±95%"]
            c = BETTER if m < 0 else WORSE
            ax.plot([m - ci, m + ci], [yi, yi], color=c, lw=2,
                    solid_capstyle="round")
            ax.plot(m, yi, "o", color=c, ms=6)
        ax.axvline(0, color=INK2, lw=0.8)
        ax.set_yticks(list(y), sub["label"], fontsize=8, color=INK)
        ax.set_title(title, fontsize=9.5, color=INK, loc="left")
        if (sub[f"{key} mean"].abs().max() or 0) > 0:
            ax.set_xscale("symlog", linthresh=max(
                1.0, sub[f"{key} ±95%"].median()))
        _style(ax)
    fig.suptitle("Per-seed paired differences (negative = better than "
                 + base_label + "; whiskers = 95% CI)", fontsize=11,
                 color=INK, x=0.01, ha="left")
    fig.tight_layout(rect=(0, 0, 1, 0.93))
    fig.savefig(out, dpi=150)
    plt.close(fig)
    return out


def sensitivity(results_dir: str, out: str,
                strategy: str = "DQNAgentLong",
                base: str = "FixedCycleBaseline") -> pd.DataFrame:
    """Demand-level sensitivity (role of the reference's
    `sensitivity test.ipynb`): per demand level, the paired Δdelay of the
    DQN vs the best classical controller — WHERE does learned control win?

    Episodes pair by seed (identical demand draws per seed across
    strategies), so conditioning on the drawn main/ramp flow gives the
    per-regime effect directly. Returns the per-level table and writes a
    two-panel plot (by mainline demand, by on-ramp demand)."""
    from scipy import stats as _st

    bdf = pd.read_csv(os.path.join(
        results_dir, f"results_{base}.csv")).set_index("seed")
    df = pd.read_csv(os.path.join(
        results_dir, f"results_{strategy}.csv")).set_index("seed")
    common = df.index.intersection(bdf.index)
    bdf, df = bdf.loc[common], df.loc[common]
    d = pd.DataFrame({
        "main": bdf["main_flow_vph"],
        "ramp": bdf["on_ramp_flow_vph"],
        "dDelay": df["avg_time_loss"] - bdf["avg_time_loss"],
        "dTTT": df["total_travel_time"] - bdf["total_travel_time"],
    })

    def level_table(key):
        rows = []
        for level, g in d.groupby(key):
            n = len(g)
            sem = g["dDelay"].std(ddof=1) / n ** 0.5 if n > 1 else 0.0
            ci = (float(_st.t.ppf(0.975, n - 1)) * sem) if n > 1 else 0.0
            rows.append({"level": level, "n": n,
                         "dDelay mean": g["dDelay"].mean(),
                         "dDelay ±95%": ci,
                         "win%": 100.0 * (g["dDelay"] < 0).mean()})
        return pd.DataFrame(rows)

    tables = {"main": level_table("main"), "ramp": level_table("ramp")}
    label = SHORT.get(strategy, strategy)
    fig, axes = plt.subplots(1, 2, figsize=(11, 3.6))
    for ax, (key, title) in zip(axes, (
            ("main", "by mainline demand (vph)"),
            ("ramp", "by on-ramp demand (vph)"))):
        t = tables[key]
        x = range(len(t))
        for xi, (_, r) in zip(x, t.iterrows()):
            c = BETTER if r["dDelay mean"] < 0 else WORSE
            ax.plot([xi, xi], [r["dDelay mean"] - r["dDelay ±95%"],
                               r["dDelay mean"] + r["dDelay ±95%"]],
                    color=c, lw=2, solid_capstyle="round")
            ax.plot(xi, r["dDelay mean"], "o", color=c, ms=6)
            ax.annotate(f"{r['win%']:.0f}%  n={int(r['n'])}",
                        (xi, r["dDelay mean"]), textcoords="offset points",
                        xytext=(6, 6), fontsize=7, color=INK2)
        ax.axhline(0, color=INK2, lw=0.8)
        ax.set_xticks(list(x), [f"{int(v):,}" for v in t["level"]],
                      fontsize=8, color=INK)
        ax.set_title(f"Paired Δdelay (s/veh) {title}", fontsize=9.5,
                     color=INK, loc="left")
        _style(ax)
        ax.yaxis.grid(True, color="#e8e7e2", linewidth=0.6)
        ax.xaxis.grid(False)
    fig.suptitle(f"{label} vs {SHORT.get(base, base)} — demand sensitivity "
                 "(negative = DQN better; labels = win rate)", fontsize=11,
                 color=INK, x=0.01, ha="left")
    fig.tight_layout(rect=(0, 0, 1, 0.90))
    fig.savefig(out, dpi=150)
    plt.close(fig)
    return pd.concat(tables, names=["axis"])


CORE = ("AlwaysGreenBaseline", "FixedCycleBaseline", "AlineaDsBaseline",
        "PiAlineaDsBaseline", "DQNAgentLong")


def distributions(results_dir: str, out: str) -> None:
    """Per-episode distributions (box + strip) for the core strategies —
    the spread behind the means (reference's notebook box plots over the
    50-episode `results_<Strategy>.csv` tables, SURVEY.md §6)."""
    import numpy as np

    panels = [("total_travel_time", "Total travel time (s)"),
              ("avg_time_loss", "Avg delay (s/veh)"),
              ("total_spillback_time_sec", "Spillback time (s)"),
              ("avg_mainline_speed_mergeArea_km/h", "Merge speed (m/s)")]
    data = {}
    for s in CORE:
        p = os.path.join(results_dir, f"results_{s}.csv")
        if os.path.isfile(p):
            data[s] = pd.read_csv(p)
    fig, axes = plt.subplots(2, 2, figsize=(12, 7))
    rng = np.random.default_rng(0)
    for ax, (col, title) in zip(axes.flat, panels):
        labels, series = [], []
        for s, df in data.items():
            if col in df.columns:
                labels.append(SHORT.get(s, s))
                series.append(df[col].dropna().to_numpy())
        bp = ax.boxplot(series, vert=False, showfliers=False,
                        widths=0.55, patch_artist=True,
                        medianprops=dict(color=INK, lw=1.2))
        for patch, s in zip(bp["boxes"], data):
            c = ACCENT if s.startswith("DQN") else NEUTRAL
            patch.set(facecolor=c, alpha=0.35, edgecolor=c)
        for i, (vals, s) in enumerate(zip(series, data)):
            c = ACCENT if s.startswith("DQN") else NEUTRAL
            jitter = rng.uniform(-0.14, 0.14, len(vals))
            ax.plot(vals, i + 1 + jitter, ".", color=c, ms=3, alpha=0.55)
        ax.set_yticks(range(1, len(labels) + 1), labels, fontsize=8,
                      color=INK)
        ax.invert_yaxis()
        ax.set_title(title, fontsize=9.5, color=INK, loc="left")
        _style(ax)
        ax.xaxis.set_major_formatter(matplotlib.ticker.FuncFormatter(_compact))
    fig.suptitle("Per-episode distributions, seeded evaluation "
                 "(same demand draws across strategies)", fontsize=11,
                 color=INK, x=0.01, ha="left")
    fig.tight_layout(rect=(0, 0, 1, 0.95))
    fig.savefig(out, dpi=150)
    plt.close(fig)
    return out


def route_breakdown(results_dir: str, out: str) -> None:
    """Per-route delay/throughput split (Mainline / On-Ramp / Off-Ramp
    aggregates from parsers.py, reference parsers.py:21-102): where each
    controller puts the delay — ramp metering trades on-ramp waiting for
    mainline flow."""
    routes = ("Mainline", "On-Ramp", "Off-Ramp")
    rows = []
    for s in CORE:
        p = os.path.join(results_dir, f"results_{s}.csv")
        if not os.path.isfile(p):
            continue
        df = pd.read_csv(p)
        row = {"strategy": s, "label": SHORT.get(s, s)}
        for r in routes:
            col = f"{r}_avg_time_loss"
            if col in df.columns:
                row[r] = df[col].mean()
        rows.append(row)
    t = pd.DataFrame(rows)
    fig, axes = plt.subplots(1, 3, figsize=(12, 3.4), sharey=True)
    for ax, r in zip(axes, routes):
        colors = [ACCENT if s.startswith("DQN") else NEUTRAL
                  for s in t["strategy"]]
        y = range(len(t))
        ax.barh(y, t[r], color=colors, height=0.62)
        ax.set_yticks(list(y), t["label"], fontsize=8, color=INK)
        ax.invert_yaxis()
        ax.set_title(f"{r} avg delay (s/veh)", fontsize=9.5, color=INK,
                     loc="left")
        _style(ax)
        for yi, v in zip(y, t[r]):
            ax.text(v, yi, " " + _compact(v, None, label=True),
                    va="center", fontsize=7, color=INK2)
        ax.set_xlim(0, t[r].max() * 1.22)
    fig.suptitle("Where the delay goes: per-route average delay by "
                 "controller", fontsize=11, color=INK, x=0.01, ha="left")
    fig.tight_layout(rect=(0, 0, 1, 0.93))
    fig.savefig(out, dpi=150)
    plt.close(fig)
    return out


def improvement_matrices(results_dir: str, out: str) -> None:
    """Pairwise %-improvement matrices, one per metric (role of the
    reference's `plots/improvement_matrices/*.png`, six notebook
    heatmaps): cell (row, col) = how much better `row` is than `col`,
    as a percentage of `col`, over the common evaluation seeds (paired
    draws, so demand variance cancels). Positive = row better."""
    import numpy as np
    from matplotlib.colors import LinearSegmentedColormap, TwoSlopeNorm

    metrics = [("total_travel_time", "Total travel time", False),
               ("avg_time_loss", "Avg delay", False),
               ("avg_ramp_queue_veh", "Ramp queue", False),
               ("total_spillback_time_sec", "Spillback time", False),
               ("avg_mainline_speed_mergeArea_km/h", "Merge speed", True),
               ("total_co2_mg", "CO2 emissions", False)]
    data = {}
    for s in CORE:
        p = os.path.join(results_dir, f"results_{s}.csv")
        if os.path.isfile(p):
            data[s] = pd.read_csv(p).set_index("seed")
    if len(data) < 2:   # pairwise matrices need at least two strategies
        return None
    names = list(data)
    labels = [SHORT.get(s, s) for s in names]
    common = None
    for df in data.values():
        common = df.index if common is None else common.intersection(df.index)

    # Diverging map through near-white: WORSE -> paper -> BETTER.
    cmap = LinearSegmentedColormap.from_list(
        "imp", [WORSE, "#f7f6f2", BETTER])
    fig, axes = plt.subplots(2, 3, figsize=(13.5, 8.2))
    for ax, (col, title, higher_better) in zip(axes.flat, metrics):
        if any(col not in df.columns for df in data.values()):
            ax.set_visible(False)
            continue
        means = np.array([data[s].loc[common, col].mean() for s in names])
        n = len(names)
        m = np.zeros((n, n))
        for i in range(n):
            for j in range(n):
                if i == j or means[j] == 0:
                    continue
                delta = (means[i] - means[j]) if higher_better \
                    else (means[j] - means[i])
                m[i, j] = 100.0 * delta / abs(means[j])
        lim = max(1.0, np.abs(m).max())
        ax.imshow(m, cmap=cmap, norm=TwoSlopeNorm(0.0, -lim, lim),
                  aspect="auto")
        for i in range(n):
            for j in range(n):
                if i == j:
                    ax.text(j, i, "—", ha="center", va="center",
                            fontsize=7, color=INK2)
                    continue
                ax.text(j, i, f"{m[i, j]:+.1f}", ha="center", va="center",
                        fontsize=7,
                        color=INK if abs(m[i, j]) < 0.7 * lim else "#ffffff")
        ax.set_xticks(range(n), labels, fontsize=7, color=INK,
                      rotation=30, ha="right")
        ax.set_yticks(range(n), labels, fontsize=7, color=INK)
        ax.set_title(title, fontsize=9.5, color=INK, loc="left")
        ax.spines[:].set_visible(False)
        ax.tick_params(length=0)
    fig.suptitle("Pairwise improvement matrices — % improvement of row "
                 "over column (positive = row better; paired seeds, "
                 "native backend)", fontsize=11, color=INK, x=0.01,
                 ha="left")
    fig.tight_layout(rect=(0, 0, 1, 0.95))
    fig.savefig(out, dpi=150)
    plt.close(fig)
    return out


def experiment_conditions(results_dir: str, out: str) -> None:
    """Drawn evaluation conditions (role of the reference's
    `plots/distributions/{distribution_of_experiment_conditions,
    joint_distribution_of_demand_scenarios}.png`): the marginal draw
    counts of each demand level + CV penetration, and the joint
    main×ramp demand grid — what mix of regimes the seeded evaluation
    actually covered. Reads one strategy's CSV (identical draws across
    strategies by construction, seed = master+i)."""
    import numpy as np

    p = os.path.join(results_dir, "results_FixedCycleBaseline.csv")
    if not os.path.isfile(p):
        return
    df = pd.read_csv(p)
    fig = plt.figure(figsize=(12.5, 3.6))
    gs = fig.add_gridspec(1, 4, width_ratios=(1, 1, 1, 1.25))
    marg = [("main_flow_vph", "Mainline demand (vph)"),
            ("on_ramp_flow_vph", "On-ramp demand (vph)"),
            ("off_ramp_flow_vph", "Off-ramp demand (vph)")]
    for k, (col, title) in enumerate(marg):
        ax = fig.add_subplot(gs[0, k])
        counts = df[col].value_counts().sort_index()
        x = range(len(counts))
        ax.bar(x, counts.values, color=ACCENT, width=0.62)
        ax.set_xticks(list(x), [f"{int(v):,}" for v in counts.index],
                      fontsize=7, color=INK, rotation=30, ha="right")
        ax.set_title(title, fontsize=9.5, color=INK, loc="left")
        _style(ax)
        ax.xaxis.grid(False)
        ax.yaxis.grid(True, color="#e8e7e2", linewidth=0.6)
        for xi, v in zip(x, counts.values):
            ax.text(xi, v, str(int(v)), ha="center", va="bottom",
                    fontsize=7, color=INK2)
    # Joint main x ramp draw grid with penetration overlaid as text.
    ax = fig.add_subplot(gs[0, 3])
    mains = sorted(df["main_flow_vph"].unique())
    ramps = sorted(df["on_ramp_flow_vph"].unique())
    grid = (pd.crosstab(df["on_ramp_flow_vph"], df["main_flow_vph"])
            .reindex(index=ramps, columns=mains, fill_value=0)
            .to_numpy(dtype=float))
    from matplotlib.colors import LinearSegmentedColormap
    cmap = LinearSegmentedColormap.from_list("seq", ["#f7f6f2", ACCENT])
    ax.imshow(grid, cmap=cmap, aspect="auto", origin="lower")
    for i in range(len(ramps)):
        for j in range(len(mains)):
            if grid[i, j]:
                ax.text(j, i, str(int(grid[i, j])), ha="center",
                        va="center", fontsize=7,
                        color="#ffffff" if grid[i, j] > 0.7 * grid.max()
                        else INK)
    ax.set_xticks(range(len(mains)), [f"{int(v):,}" for v in mains],
                  fontsize=7, color=INK, rotation=30, ha="right")
    ax.set_yticks(range(len(ramps)), [f"{int(v):,}" for v in ramps],
                  fontsize=7, color=INK)
    ax.set_title("Joint draws: main × on-ramp", fontsize=9.5, color=INK,
                 loc="left")
    ax.set_xlabel("mainline (vph)", fontsize=7.5, color=INK2)
    ax.set_ylabel("on-ramp (vph)", fontsize=7.5, color=INK2)
    ax.spines[:].set_visible(False)
    ax.tick_params(length=0)
    pen = df["con_penetration_rate"]
    fig.suptitle("Evaluation conditions: demand draws over "
                 f"{len(df)} seeded episodes (CV penetration "
                 f"{pen.min():.2f}–{pen.max():.2f}, "
                 f"median {pen.median():.2f})", fontsize=11, color=INK,
                 x=0.01, ha="left")
    fig.tight_layout(rect=(0, 0, 1, 0.92))
    fig.savefig(out, dpi=150)
    plt.close(fig)
    return out


SWEEP_LABELS = {
    "logs/r2_long": "flagship seed 0 (PER n-step 3)",
    "logs/seeds/s1": "flagship seed 1",
    "logs/seeds/s2": "flagship seed 2",
    "logs/seeds/s3": "flagship seed 3",
    "logs/noisy": "NoisyNet 2.1M",
    "logs/noisy63": "NoisyNet 6.3M",
    "logs/dist_sweep/c51_a31": "C51 31-atom",
    "logs/dist_sweep/c51_wide": "C51 wide support",
    "logs/dist_sweep/c51_lr5": "C51 lr 5e-5",
    "logs/dist_sweep/qr_k32": "QR 32-quantile",
    "logs/dist_sweep/qr_lr5": "QR lr 5e-5",
    "logs/rainbow/noisy_s2": "NoisyNet seed 2",
    "logs/rainbow/noisy_s3": "NoisyNet seed 3",
    "logs/rainbow/noisyqr_lr5": "NoisyQr lr 5e-5",
    "logs/rainbow/noisyc51_lr5": "NoisyC51 lr 5e-5",
    "logs/rainbow/qr_lr5_s1": "QR lr 5e-5 seed 1",
    "logs/rainbow/iqn_lr5": "IQN lr 5e-5",
    "logs/rainbow/noisyqr63": "NoisyQr 6.3M",
    "logs/reval/qr_lr5": "QR lr 5e-5 (fixed sampler)",
    "logs/reval/seed3": "flagship seed 3 (fixed sampler)",
    "logs/reval/noisy63": "NoisyNet 6.3M (fixed sampler)",
}

# Agent-zoo rows: results tag -> (label, family). Families group the
# hues: flagship seeds, exploration (NoisyNet), distributional heads,
# observation variants, ablations.
ZOO = {
    "DQNAgentLong": ("flagship seed 0 · 6.3M", "flagship"),
    "DQNAgentSeed1": ("flagship seed 1", "flagship"),
    "DQNAgentSeed2": ("flagship seed 2", "flagship"),
    "DQNAgentSeed3": ("flagship seed 3", "flagship"),
    "DQNAgentNoisy": ("NoisyNet 2.1M", "noisy"),
    "DQNAgentNoisyS2": ("NoisyNet 2.1M seed 2", "noisy"),
    "DQNAgentNoisyS3": ("NoisyNet 2.1M seed 3", "noisy"),
    "DQNAgentNoisy63": ("NoisyNet 6.3M", "noisy"),
    "DQNAgentNoisyQr": ("NoisyQr 2.1M", "dist"),
    "DQNAgentNoisyQr63": ("NoisyQr 6.3M", "dist"),
    "DQNAgentNoisyC51": ("NoisyC51 2.1M", "dist"),
    "DQNAgentQr": ("QR 6.3M (best 2M)", "dist"),
    "DQNAgentQrLr5": ("QR lr5e-5", "dist"),
    "DQNAgentQrLr5S1": ("QR lr5e-5 seed 1", "dist"),
    "DQNAgentIqn": ("IQN 2.1M", "dist"),
    "DQNAgentC51": ("C51 (recalibrated)", "dist"),
    "DQNAgent": ("1-step 2.1M", "ablation"),
    "DQNAgentNStep3": ("n-step 3, 2.1M", "ablation"),
    "DQNAgentPer": ("PER 2.1M", "ablation"),
    "DQNAgentMacroLane": ("macro-lane MLP", "variant"),
    "DQNAgentMacroNoLane": ("macro-no-lane MLP", "variant"),
}

FAMILY_HUE = {"flagship": ACCENT, "noisy": "#1e9e8b", "dist": "#7c4dbe",
              "ablation": "#8a7a1e", "variant": "#566a7a"}


def agent_zoo(results_dir: str, out: str) -> str | None:
    """Every trained agent on one axis (role of the reference's
    `plots/overall_comparison/drl_models/*`): mean eval delay with a
    95% t-CI per 50-episode results CSV, rows sorted best-first and
    hued by family, with the classical-controller band for context.
    The one-figure answer to "which agent should I deploy?"."""
    import numpy as np
    from scipy import stats as _st

    rows = []
    for tag, (label, fam) in ZOO.items():
        p = os.path.join(results_dir, f"results_{tag}.csv")
        if not os.path.isfile(p):
            continue
        d = pd.read_csv(p)["avg_time_loss"]
        ci = float(_st.t.ppf(0.975, len(d) - 1)) * d.std(ddof=1) / np.sqrt(len(d))
        rows.append((label, fam, d.mean(), ci))
    if len(rows) < 3:
        return None
    rows.sort(key=lambda r: r[2])

    fig, ax = plt.subplots(figsize=(8, 0.34 * len(rows) + 1.9))
    ys = range(len(rows))[::-1]
    # Classical context lines.
    for strat, style in (("FixedCycleBaseline", "--"),
                         ("AlineaDsBaseline", ":")):
        p = os.path.join(results_dir, f"results_{strat}.csv")
        if os.path.isfile(p):
            v = pd.read_csv(p)["avg_time_loss"].mean()
            ax.axvline(v, color=INK2, linewidth=1.0, linestyle=style)
            ax.annotate(f" {SHORT.get(strat, strat)} {v:.1f}",
                        (v, len(rows) - 0.4), fontsize=7.5, color=INK2,
                        rotation=90, va="top", ha="right")
    for y, (label, fam, m, ci) in zip(ys, rows):
        c = FAMILY_HUE[fam]
        ax.plot([m - ci, m + ci], [y, y], color=c, linewidth=2.2,
                solid_capstyle="butt", alpha=0.45)
        ax.plot([m], [y], "o", color=c, markersize=5.5)
        ax.text(m, y + 0.34, f"{m:.2f}", ha="center", fontsize=7,
                color=INK2)
    ax.set_yticks(list(ys), [r[0] for r in rows], fontsize=8.5, color=INK)
    for t, (_, fam, _, _) in zip(ax.get_yticklabels(), rows):
        t.set_color(FAMILY_HUE[fam])
    ax.set_xlabel("eval avg delay (s/veh, mean ± 95% t-CI, "
                  "50 seeded episodes)", fontsize=9, color=INK)
    ax.set_title("Agent zoo — every trained agent on the same seeded "
                 "evaluation", fontsize=10, color=INK, loc="left")
    _style(ax)
    ax.xaxis.grid(True, color="#e8e7e2", linewidth=0.6)
    ax.yaxis.grid(False)
    fig.tight_layout()
    fig.savefig(out, dpi=150)
    plt.close(fig)
    return out


def snapshot_curves(results_dir: str, out: str,
                    sweeps_glob: str = "logs/**/sweep_summary.csv") -> str | None:
    """Training-budget curves: eval delay of every 1M-step snapshot
    (scripts/eval_snapshots.py 20-episode sweeps, eval seeds 42-61) vs
    training steps, one line per run. This is the checkpoint-selection
    evidence behind every shipped pack — eval delay, never training
    reward, picks the checkpoint (the two diverge past ~6.3M; see
    BENCHMARKS.md) — and the reference's reward-curve notebook analogue
    (evaluation/reward/reward.ipynb) with eval metrics instead of the
    reward proxy on the y-axis."""
    import glob as _glob

    runs = []
    for path in sorted(_glob.glob(sweeps_glob, recursive=True)):
        d = os.path.dirname(path)
        t = pd.read_csv(path)
        fin = t[t["steps"] != float("inf")]
        if fin.empty:
            continue
        # The untagged final pack lands at the run's budget: 1M-step
        # snapshot cadence + the 2.1M / 6.3M budgets used here put it
        # ~5% past the last tagged snapshot.
        budget = fin["steps"].max() * 1.05
        t = t.assign(steps=t["steps"].replace(float("inf"), budget))
        runs.append((SWEEP_LABELS.get(d, d), t.sort_values("steps")))
    if not runs:
        return None

    fc = os.path.join(results_dir, "results_FixedCycleBaseline.csv")
    fig, ax = plt.subplots(figsize=(8, 4.6))
    if os.path.isfile(fc):
        t = pd.read_csv(fc)
        # Same 20 eval seeds the sweeps use (master 42 + i).
        ref = t[t["seed"].between(42, 61)]["avg_time_loss"].mean()
        ax.axhline(ref, color=INK2, linewidth=1.0, linestyle="--")
        ax.annotate(f"FixedCycle {ref:.1f}", (0.99, ref),
                    xycoords=("axes fraction", "data"), ha="right",
                    va="bottom", fontsize=8, color=INK2)
    # Flagship seeds share the accent blue (they are one family); every
    # other run gets a hue clearly distinct from it.
    others = ["#eb6834", "#7c4dbe", "#1e9e8b", "#c23a70", "#8a7a1e",
              "#566a7a"]
    k = 0
    for label, t in runs:
        flagship = label.startswith("flagship")
        if flagship:
            color = ACCENT
        else:
            color = others[k % len(others)]
            k += 1
        ax.plot(t["steps"] / 1e6, t["delay"], marker="o", markersize=3.5,
                linewidth=1.6 if flagship else 1.1, color=color,
                alpha=1.0 if flagship else 0.85, label=label)
    ax.set_xlabel("training env-steps (millions)", fontsize=9, color=INK)
    ax.set_ylabel("eval avg delay (s/veh, 20 seeded episodes)",
                  fontsize=9, color=INK)
    ax.set_title("Eval delay vs training budget — snapshot sweeps "
                 "(checkpoint selection is by this curve)",
                 fontsize=10, color=INK, loc="left")
    _style(ax)
    ax.yaxis.grid(True, color="#e8e7e2", linewidth=0.6)
    ax.legend(fontsize=7.5, frameon=False, ncol=2, loc="upper right")
    fig.tight_layout()
    fig.savefig(out, dpi=150)
    plt.close(fig)
    return out


def main(results_dir: str = "evaluation/results",
         out_dir: str = "evaluation/results/plots") -> None:
    os.makedirs(out_dir, exist_ok=True)
    sys.stdout, hold = open(os.devnull, "w"), sys.stdout
    try:
        table = summarize(results_dir)
        ptable = paired(results_dir)
    finally:
        sys.stdout.close()
        sys.stdout = hold
    # Each plot function returns the written path, or None when its
    # inputs are absent — report only what actually landed on disk.
    wrote = [
        strategy_comparison(table,
                            os.path.join(out_dir, "strategy_comparison.png")),
        paired_differences(ptable,
                           os.path.join(out_dir, "paired_differences.png")),
        distributions(results_dir, os.path.join(out_dir, "distributions.png")),
        route_breakdown(results_dir,
                        os.path.join(out_dir, "route_breakdown.png")),
        improvement_matrices(
            results_dir, os.path.join(out_dir, "improvement_matrices.png")),
        experiment_conditions(
            results_dir, os.path.join(out_dir, "experiment_conditions.png")),
        snapshot_curves(
            results_dir, os.path.join(out_dir, "snapshot_curves.png")),
        agent_zoo(results_dir, os.path.join(out_dir, "agent_zoo.png")),
    ]
    if os.path.isfile(os.path.join(results_dir, "results_DQNAgentLong.csv")):
        t = sensitivity(results_dir,
                        os.path.join(out_dir, "sensitivity_demand.png"))
        print(t.round(2).to_string())
        wrote.append(os.path.join(out_dir, "sensitivity_demand.png"))
    names = ", ".join(os.path.basename(w) for w in wrote if w)
    print(f"wrote {out_dir}: {names}")


if __name__ == "__main__":
    main(*sys.argv[1:])
