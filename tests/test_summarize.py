"""evaluation/summarize.py: means table, paired per-seed stats, multi-seed
flagship aggregation — checked against hand-computed values on synthetic
results CSVs (schema of runtime/evaluate.py's merged rows; reference
analogue: the means tables in /root/reference/evaluation/results and
`sensitivity test.ipynb`'s paired comparisons)."""

import os
import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from evaluation import summarize  # noqa: E402

COLS = {
    "total_travel_time": [100.0, 110.0, 120.0, 130.0],
    "avg_time_loss": [10.0, 12.0, 14.0, 16.0],
    "total_spillback_time_sec": [1.0, 2.0, 3.0, 4.0],
    "avg_ramp_queue_veh": [5.0, 5.0, 5.0, 5.0],
    "avg_mainline_speed_mergeArea_km/h": [15.0, 15.0, 15.0, 15.0],
    "avg_mainline_occ_mergeArea_percent": [20.0, 20.0, 20.0, 20.0],
    "total_co2_mg": [1e6, 1e6, 1e6, 1e6],
    "total_throughput": [5000.0, 5100.0, 5200.0, 5300.0],
    "service_rate": [0.8, 0.8, 0.8, 0.8],
}


def _write(results_dir, strategy, delay_shift=0.0, ttt_shift=0.0,
           seeds=(42, 43, 44, 45)):
    df = pd.DataFrame({"seed": list(seeds), **COLS})
    df["avg_time_loss"] += delay_shift
    df["total_travel_time"] += ttt_shift
    df.to_csv(os.path.join(results_dir, f"results_{strategy}.csv"),
              index=False)
    return df


@pytest.fixture()
def results_dir(tmp_path):
    d = str(tmp_path)
    _write(d, "FixedCycleBaseline")
    # Constant -2.0 delay / -5.0 TTT deltas -> zero-width CI, 100% win.
    _write(d, "DQNAgent", delay_shift=-2.0, ttt_shift=-5.0)
    return d


def test_main_table_means_and_order(results_dir, capsys):
    table = summarize.main(results_dir)
    capsys.readouterr()
    assert list(table["strategy"]) == ["FixedCycleBaseline", "DQNAgent"]
    fc = table.set_index("strategy").loc["FixedCycleBaseline"]
    assert fc["episodes"] == 4
    assert fc["TTT (s)"] == pytest.approx(115.0)
    assert fc["Avg delay (s/veh)"] == pytest.approx(13.0)
    dqn = table.set_index("strategy").loc["DQNAgent"]
    assert dqn["Avg delay (s/veh)"] == pytest.approx(11.0)


def test_paired_hand_computed(results_dir, capsys):
    # Give DQN a non-constant delta so the t-CI is exercised:
    # dDelay = [-3, -1, -2, +2]  -> mean -1.0, sd 2.1602, n=4.
    df = pd.DataFrame({"seed": [42, 43, 44, 45], **COLS})
    df["avg_time_loss"] += np.array([-3.0, -1.0, -2.0, 2.0])
    df.to_csv(os.path.join(results_dir, "results_DQNAgent.csv"), index=False)

    table = summarize.paired(results_dir).set_index("strategy")
    capsys.readouterr()
    row = table.loc["DQNAgent"]
    d = np.array([-3.0, -1.0, -2.0, 2.0])
    assert row["n"] == 4
    assert row["dDelay mean"] == pytest.approx(d.mean())
    from scipy import stats
    want_ci = stats.t.ppf(0.975, 3) * d.std(ddof=1) / 2.0
    assert row["dDelay ±95%"] == pytest.approx(want_ci)
    assert row["dDelay win%"] == pytest.approx(75.0)
    # Student-t, not normal: t(.975, 3)=3.18 vs 1.96 is a 62% wider CI.
    assert row["dDelay ±95%"] > 1.96 * d.std(ddof=1) / 2.0


def test_paired_aligns_on_common_seeds(results_dir, capsys):
    # A strategy evaluated on a shifted seed range pairs only the overlap.
    _write(results_dir, "AlineaDsBaseline", delay_shift=3.0,
           seeds=(44, 45, 46, 47))
    table = summarize.paired(results_dir).set_index("strategy")
    capsys.readouterr()
    assert table.loc["AlineaDsBaseline", "n"] == 2  # seeds 44, 45
    # Values are positional: Alinea's seed-44 row carries base's seed-42
    # value +3, and base's seed-44 value is +4 above that -> delta -1.
    assert table.loc["AlineaDsBaseline", "dDelay mean"] == pytest.approx(-1.0)


def test_seeds_table_collects_flagship_runs(results_dir, capsys):
    _write(results_dir, "DQNAgentLong", delay_shift=-3.0, ttt_shift=-10.0)
    _write(results_dir, "DQNAgentSeed1", delay_shift=-1.0, ttt_shift=5.0)
    _write(results_dir, "DQNAgentSeed2", delay_shift=-2.0, ttt_shift=0.0)
    table = summarize.seeds(results_dir)
    capsys.readouterr()
    assert list(table["train seed"]) == ["s0 (orig)", "s1", "s2"]
    t = table.set_index("train seed")
    assert t.loc["s0 (orig)", "dDelay vs base"] == pytest.approx(-3.0)
    assert t.loc["s1", "dTTT vs base"] == pytest.approx(5.0)
    assert t.loc["s2", "dDelay win%"] == pytest.approx(100.0)
    # Plain DQNAgent / ablation tags are NOT flagship seed rows.
    assert "DQNAgent" not in set(table["train seed"])


def test_seeds_ignores_tagged_variants_and_sorts_numerically(results_dir,
                                                             capsys):
    _write(results_dir, "DQNAgentSeed2", delay_shift=-2.0)
    _write(results_dir, "DQNAgentSeed10", delay_shift=-1.0)
    # Glob-matches results_DQNAgentSeed*.csv but is NOT a flagship seed
    # row; must not overwrite the real seed-2 row.
    _write(results_dir, "DQNAgentSeed2Pen50", delay_shift=9.0)
    table = summarize.seeds(results_dir)
    capsys.readouterr()
    assert list(table["train seed"]) == ["s2", "s10"]
    t = table.set_index("train seed")
    assert t.loc["s2", "dDelay vs base"] == pytest.approx(-2.0)


def test_seeds_skips_short_overlap_and_missing_base(results_dir, tmp_path,
                                                    capsys):
    _write(results_dir, "DQNAgentSeed1", delay_shift=-1.0)
    _write(results_dir, "DQNAgentSeed2", seeds=(90, 91, 92, 93))
    table = summarize.seeds(results_dir)
    out = capsys.readouterr().out
    assert list(table["train seed"]) == ["s1"]  # s2: no common seeds
    assert "skipping s2" in out
    empty = tmp_path / "empty"
    empty.mkdir()
    with pytest.raises(SystemExit, match="no results for base"):
        summarize.seeds(str(empty))


def test_seeds_empty_dir_is_graceful(tmp_path, capsys):
    _write(str(tmp_path), "FixedCycleBaseline")
    table = summarize.seeds(str(tmp_path))
    assert table.empty
    assert "no flagship seed results" in capsys.readouterr().out
