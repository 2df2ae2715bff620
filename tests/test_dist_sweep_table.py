"""Tests for scripts/dist_sweep_table.py (the sweep-consolidator cited as
Rainbow-closure evidence in BENCHMARKS.md).

The consolidator reads each config's ``logs/<dir>/sweep_summary.csv``
(written by scripts/eval_snapshots.py), picks the eval-best checkpoint by
delay, and prints one markdown table; configs whose sweeps haven't run
yet must surface as explicit "(pending)" lines, never silently vanish.
"""

import importlib.util
import os

import pandas as pd


def _load_module():
    path = os.path.join(os.path.dirname(__file__), "..", "scripts",
                        "dist_sweep_table.py")
    spec = importlib.util.spec_from_file_location("dist_sweep_table", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_table_picks_eval_best_and_reports_pending(tmp_path, monkeypatch,
                                                   capsys):
    mod = _load_module()
    monkeypatch.setattr(mod, "CONFIGS", [
        ("fake/done", "Fake done config"),
        ("fake/pending", "Fake pending config"),
    ])
    d = tmp_path / "logs" / "fake" / "done"
    d.mkdir(parents=True)
    pd.DataFrame({
        "pack": ["A_step1000k_model.pack", "A_step2000k_model.pack",
                 "A_model.pack"],
        "steps": [1_000_000.0, 2_000_000.0, float("inf")],
        "TTT": [470_000.0, 450_123.4, 460_000.0],
        "delay": [36.0, 31.5, 34.0],
        "throughput": [5900.0, 6010.6, 5950.0],
    }).to_csv(d / "sweep_summary.csv", index=False)
    monkeypatch.chdir(tmp_path)

    mod.main()
    out = capsys.readouterr().out

    assert "(pending: logs/fake/pending/sweep_summary.csv)" in out
    # Best-by-delay row: the 2M checkpoint, not final or 1M.
    # tabulate re-parses numeric-looking strings, so "31.50" renders "31.5"
    assert "2M" in out and "450,123" in out and "31.5" in out
    assert "36.00" not in out.split("|")[0]  # table present, not raw dump
    assert "Fake done config" in out


def test_all_pending_prints_no_table(tmp_path, monkeypatch, capsys):
    mod = _load_module()
    monkeypatch.setattr(mod, "CONFIGS", [("fake/nope", "Nope")])
    monkeypatch.chdir(tmp_path)
    mod.main()
    out = capsys.readouterr().out
    assert "(pending: logs/fake/nope/sweep_summary.csv)" in out
    assert "|" not in out  # no empty markdown table
