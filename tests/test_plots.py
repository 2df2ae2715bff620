"""evaluation/plots.py sensitivity analysis: per-demand-level paired
deltas computed from seed-paired results CSVs (role of the reference's
`sensitivity test.ipynb`)."""

import importlib.util
import os
import sys

import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_plots():
    sys.path.insert(0, os.path.join(REPO, "evaluation"))
    spec = importlib.util.spec_from_file_location(
        "eval_plots", os.path.join(REPO, "evaluation", "plots.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_sensitivity_pairs_by_seed_and_bins_by_demand(tmp_path):
    plots = _load_plots()
    rng = np.random.default_rng(0)
    seeds = np.arange(20)
    mains = rng.choice([4000, 5000, 6000], size=20)
    base = pd.DataFrame({
        "seed": seeds, "main_flow_vph": mains,
        "on_ramp_flow_vph": rng.choice([1400, 2000], size=20),
        "avg_time_loss": 30.0 + 0.01 * mains,
        "total_travel_time": 450_000.0 + mains,
    })
    # DQN: wins by exactly 2 s/veh except at main=6000 where it loses by 1.
    dqn = base.copy()
    dqn["avg_time_loss"] = base["avg_time_loss"] + np.where(
        base["main_flow_vph"] == 6000, 1.0, -2.0)
    base.to_csv(tmp_path / "results_FixedCycleBaseline.csv", index=False)
    dqn.to_csv(tmp_path / "results_DQNAgentLong.csv", index=False)

    out = str(tmp_path / "sens.png")
    table = plots.sensitivity(str(tmp_path), out)
    assert os.path.isfile(out)
    main_t = table.loc["main"].set_index("level")
    assert main_t.loc[4000, "dDelay mean"] == -2.0
    assert main_t.loc[4000, "win%"] == 100.0
    assert main_t.loc[6000, "dDelay mean"] == 1.0
    assert main_t.loc[6000, "win%"] == 0.0
    assert int(main_t["n"].sum()) == 20


def test_snapshot_curves_plots_sweeps_and_skips_when_absent(tmp_path):
    plots = _load_plots()
    # FixedCycle reference over the sweep's eval seeds (42..61).
    pd.DataFrame({
        "seed": np.arange(42, 62),
        "avg_time_loss": np.full(20, 34.0),
    }).to_csv(tmp_path / "results_FixedCycleBaseline.csv", index=False)
    d = tmp_path / "logs" / "run1"
    d.mkdir(parents=True)
    pd.DataFrame({
        "pack": ["a_step1000k_model.pack", "a_step2000k_model.pack",
                 "a_model.pack"],
        "steps": [1e6, 2e6, float("inf")],   # final pack -> run budget
        "TTT": [500e3, 460e3, 455e3],
        "delay": [40.0, 33.0, 32.5],
        "throughput": [5800, 6000, 6010],
    }).to_csv(d / "sweep_summary.csv", index=False)

    out = str(tmp_path / "curves.png")
    got = plots.snapshot_curves(
        str(tmp_path), out, sweeps_glob=str(tmp_path / "logs" / "**" /
                                            "sweep_summary.csv"))
    assert got == out and os.path.isfile(out)
    # No sweeps anywhere -> None, nothing written.
    assert plots.snapshot_curves(
        str(tmp_path), str(tmp_path / "none.png"),
        sweeps_glob=str(tmp_path / "empty" / "**" / "sweep_summary.csv"),
    ) is None
    assert not os.path.isfile(tmp_path / "none.png")
