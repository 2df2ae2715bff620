"""Within-episode time-series comparison: DQN vs classical controllers.

The reference's plot corpus includes per-episode detector traces (queue,
merge speed, occupancy over the hour) under
``evaluation/results/plots/`` — outputs of its ``evaluatiom.ipynb`` /
``sensitivity test.ipynb`` notebooks over the step CSVs written by
``dqn/env_wrap.py:119-144`` (info-dict keys from
``rl_controller.py:265-292`` and ``baselines.py:54-74``). This generates
the equivalent directly: one SEEDED episode per strategy (identical
demand draw), per-cycle traces of ramp queue, merge speed, bottleneck
occupancy, and the chosen green time.

Usage: python evaluation/episode_timeseries.py [seed] [out.png]
"""

from __future__ import annotations

import os
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# Palette consistent with plots.py (validated light-mode set).
COLORS = {
    "FixedCycleBaseline": "#b9b8b2",
    "AlineaDsBaseline": "#7a9a3d",
    "PiAlineaDsBaseline": "#c79a2e",
    "DQN": "#2a78d6",
}
LABELS = {
    "FixedCycleBaseline": "FixedCycle",
    "AlineaDsBaseline": "ALINEA",
    "PiAlineaDsBaseline": "PI-ALINEA",
    "DQN": "DQN flagship",
}
INK, INK2 = "#0b0b0b", "#52514e"

PANELS = [
    ("ramp_queue_veh", "Ramp queue (veh)"),
    ("mainline_speed_mergeArea_km/h", "Merge-area speed (m/s)"),
    ("mainline_occ_mergeArea_percent", "Bottleneck occupancy (%)"),
    ("chosen_green_time_sec", "Chosen green time (s)"),
]


def trace_episode(strategy: str, seed: int, pack: str | None = None):
    """Run one seeded episode; returns a list of per-cycle info dicts."""
    from multimodal_drl_rmc_tpu.runtime.rollout import (
        BaselineRunner, PolicyRunner)

    if strategy == "DQN":
        runner = PolicyRunner(pack, backend="native")
    else:
        runner = BaselineRunner(strategy, backend="native")
    rows = []
    env = runner.env
    obs = env.reset(seed=seed)
    if isinstance(obs, tuple):
        obs = obs[0]
    done = False
    while not done:
        action = runner.action(obs) if hasattr(runner, "action") else 0
        obs, _rew, term, trunc, info = env.step(action)
        rows.append(dict(info))
        done = term or trunc
    runner.close()
    return rows


def main(seed: int = 42,
         out: str = "evaluation/results/plots/episode_timeseries.png",
         pack: str = "save/1ramp_1x3/"
                     "PerDuelingDoubleDQNAgent_lr0.0001_model.pack") -> None:
    traces = {}
    for strat in ("FixedCycleBaseline", "AlineaDsBaseline",
                  "PiAlineaDsBaseline", "DQN"):
        traces[strat] = trace_episode(strat, seed,
                                      pack if strat == "DQN" else None)
        print(f"{strat}: {len(traces[strat])} control steps")

    def binned(rows, key, width_s=40.0):
        """40 s cycle-bin means (baselines log at 1 Hz; the RL agent per
        cycle): comparable traces, and empty-loop zero speeds drop out.

        Every row's sim_time is the END of the interval it covers (the
        RL agent logs at cycle end t=40,80,...; baselines after each 1 s
        step), so bins are half-open (t0, t0+width] — bucket by the
        epsilon-shifted end time, or the DQN trace lands a full cycle
        late relative to the baselines."""
        buckets: dict = {}
        for r in rows:
            if key not in r:
                continue
            v = float(r[key])
            if "speed" in key and v <= 0.0:
                continue  # no vehicle over the loop this second
            b = max(0, int((float(r["sim_time"]) - 1e-6) // width_s))
            buckets.setdefault(b, []).append(v)
        ts = sorted(buckets)
        return ([(b + 1) * width_s / 60.0 for b in ts],
                [sum(buckets[b]) / len(buckets[b]) for b in ts])

    fig, axes = plt.subplots(2, 2, figsize=(12, 6.5))
    for ax, (key, title) in zip(axes.flat, PANELS):
        for strat, rows in traces.items():
            if key == "chosen_green_time_sec" and strat != "DQN":
                continue  # baselines have no green-time action
            t, v = binned(rows, key)
            if not v:
                continue
            step = strat == "DQN" and key == "chosen_green_time_sec"
            ax.plot(t, v, color=COLORS[strat], lw=1.4,
                    label=LABELS[strat],
                    drawstyle="steps-post" if step else "default")
        ax.set_title(title, fontsize=9.5, color=INK, loc="left")
        ax.set_xlabel("sim time (min)", fontsize=8, color=INK2)
        ax.spines[["top", "right"]].set_visible(False)
        ax.spines[["left", "bottom"]].set_color(INK2)
        ax.tick_params(colors=INK2, labelsize=8)
        ax.yaxis.grid(True, color="#e8e7e2", linewidth=0.6)
        ax.set_axisbelow(True)
    axes.flat[0].legend(fontsize=8, frameon=False)
    fig.suptitle(f"One seeded episode (seed {seed}, identical demand draw) "
                 "— controller behavior over the hour", fontsize=11,
                 color=INK, x=0.01, ha="left")
    fig.tight_layout(rect=(0, 0, 1, 0.94))
    os.makedirs(os.path.dirname(out), exist_ok=True)
    fig.savefig(out, dpi=150)
    print(f"wrote {out}")


if __name__ == "__main__":
    args = sys.argv[1:]
    main(int(args[0]) if args else 42, *args[1:])
