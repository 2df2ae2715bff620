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
