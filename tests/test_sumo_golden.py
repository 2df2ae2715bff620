"""Golden-file parity: generated SUMO assets vs the reference's checked-in
scenario files (VERDICT r2 item 1 — de-risk the never-run-against-real-SUMO
path without a SUMO install).

The reference ships hand-edited XML under
``/root/reference/env/custom_env/data/1ramp_1x3/`` and regenerates the
route file at runtime (sumo_env.py:559-634). These tests assert that
``envs/scenario.py``'s generated assets are element-equivalent to those
files: every induction loop (id/lane/pos/period, 1ramp_1x3.add.xml:8-26),
the ``rl`` TL program (add.xml:31-35), the .sumocfg processing semantics,
and the route file's vTypes / route chains / flow rows against the
checked-in sample (episode-2 draw: main 5000, ramp 1800, off 500). A
SUMO-equipped host should need zero code changes — only ``pytest`` plus
``evaluate.py --backend sumo``.
"""

from __future__ import annotations

import os
import random
import xml.etree.ElementTree as ET

import pytest

from multimodal_drl_rmc_tpu.config import ScenarioConfig
from multimodal_drl_rmc_tpu.envs.backend import draw_demand
from multimodal_drl_rmc_tpu.envs.scenario import (
    RAMP_1X3,
    route_file_xml,
    write_sumo_scenario,
)

REF_DATA = "/root/reference/env/custom_env/data/1ramp_1x3"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_DATA), reason="reference assets not mounted")


@pytest.fixture(scope="module")
def generated(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("scen"))
    paths = write_sumo_scenario(RAMP_1X3, out, run_netconvert=False)
    return paths


def test_add_xml_loops_match_reference_golden(generated):
    """All 18 induction loops element-for-element: id, lane, position,
    aggregation period (reference 1ramp_1x3.add.xml:8-26). The file=
    attribute is presentation (the reference's own copy has a typo'd
    double slash and one mismatched filename) and is not compared."""
    def loops(path):
        root = ET.parse(path).getroot()
        return {
            el.get("id"): (el.get("lane"), float(el.get("pos")),
                           float(el.get("period")))
            for el in root.iter("inductionLoop")
        }

    ref = loops(os.path.join(REF_DATA, "1ramp_1x3.add.xml"))
    gen = loops(generated["add"])
    assert len(ref) == 18
    assert set(gen) == set(ref)
    for loop_id, (lane, pos, period) in ref.items():
        glane, gpos, gperiod = gen[loop_id]
        assert glane == lane, loop_id
        assert gpos == pytest.approx(pos, abs=1e-6), loop_id
        assert gperiod == pytest.approx(period), loop_id


def test_add_xml_tl_program_matches_reference_golden(generated):
    """The active ramp-meter TL program 'rl' (add.xml:31-35): same id,
    type, programID, offset and the exact G->r phase sequence with
    durations. (The reference's alternative programs are commented out.)"""
    def tl(path):
        root = ET.parse(path).getroot()
        logics = [el for el in root.iter("tlLogic")]
        assert len(logics) == 1, "exactly one active TL program"
        el = logics[0]
        phases = [(float(p.get("duration")), p.get("state"))
                  for p in el.iter("phase")]
        return (el.get("id"), el.get("type"), el.get("programID"),
                float(el.get("offset")), phases)

    assert tl(generated["add"]) == tl(os.path.join(REF_DATA,
                                                   "1ramp_1x3.add.xml"))


def test_sumocfg_matches_reference_golden(generated):
    """.sumocfg processing semantics (reference 1ramp_1x3.sumocfg):
    identical input file basenames and the script-controlled processing /
    routing / report values."""
    def cfg(path):
        root = ET.parse(path).getroot()
        out = {}
        for section in ("input", "processing", "routing", "report", "time"):
            sec = root.find(section)
            if sec is None:
                continue
            for el in sec:
                out[el.tag] = el.get("value")
        return out

    ref = cfg(os.path.join(REF_DATA, "1ramp_1x3.sumocfg"))
    gen = cfg(generated["sumocfg"])
    for key in ("net-file", "route-files", "additional-files"):
        assert os.path.basename(gen[key]) == os.path.basename(ref[key]), key
    for key in ("time-to-teleport", "waiting-time-memory",
                "device.rerouting.probability", "verbose",
                "duration-log.statistics", "no-step-log", "begin"):
        assert gen[key] == ref[key], key


def _parse_routes(text_or_path, from_string=False):
    root = (ET.fromstring(text_or_path) if from_string
            else ET.parse(text_or_path).getroot())
    vtypes = {el.get("id"): {k: v for k, v in el.attrib.items() if k != "id"}
              for el in root.iter("vType")}
    routes = {el.get("id"): el.get("edges") for el in root.iter("route")}
    flows = {el.get("id"): {k: v for k, v in el.attrib.items() if k != "id"}
             for el in root.iter("flow")}
    return vtypes, routes, flows


def test_route_xml_matches_reference_checked_in_sample():
    """Regenerating the exact demand draw of the reference's checked-in
    1ramp_1x3.rou.xml (main 5000, ramp 1800, off 500, eval split) must
    reproduce every vType attribute, route edge chain, and flow row
    (sumo_env.py:588-602 'total-1 connected + 1 default' eval split and
    the flow attribute set at :620-626)."""
    ref_v, ref_r, ref_f = _parse_routes(
        os.path.join(REF_DATA, "1ramp_1x3.rou.xml"))
    gen_v, gen_r, gen_f = _parse_routes(
        route_file_xml(
            RAMP_1X3, main_flow_vph=5000, on_ramp_flow_vph=1800,
            off_ramp_flow_vph=500, pen_rate=0.5, episode_seconds=3600.0,
        ),
        from_string=True,
    )
    # vTypes: def (sigma .9) and con (sigma .8, red) with identical physics.
    assert set(gen_v) == set(ref_v) == {"def", "con"}
    for vid, attrs in ref_v.items():
        for k, v in attrs.items():
            assert float_eq(gen_v[vid].get(k), v), (vid, k)
    # Route chains are the reference's exact hardcoded edge strings.
    assert gen_r == ref_r
    # Flow rows: same ids, types, routes, rates, and depart attributes.
    assert set(gen_f) == set(ref_f)
    for fid, attrs in ref_f.items():
        for k, v in attrs.items():
            assert float_eq(gen_f[fid].get(k), v), (fid, k)


def float_eq(a: str | None, b: str) -> bool:
    if a == b:
        return True
    try:
        return float(a) == float(b)
    except (TypeError, ValueError):
        return False


def test_route_xml_training_split_matches_commented_reference():
    """The penetration-rate split the reference documents for training
    (sumo_env.py:597-602, commented out in eval builds): con = int(total *
    pen), def = int(total * (1 - pen)) per flow."""
    _, _, flows = _parse_routes(
        route_file_xml(
            RAMP_1X3, main_flow_vph=5000, on_ramp_flow_vph=1700,
            off_ramp_flow_vph=300, pen_rate=0.37, episode_seconds=3600.0,
            split_by_penetration=True,
        ),
        from_string=True,
    )
    for total, con_id, def_id in ((5000, "main_con", "main_def"),
                                  (1700, "on_ramp_con", "on_ramp_def"),
                                  (300, "off_ramp_con", "off_ramp_def")):
        assert int(flows[con_id]["vehsPerHour"]) == int(total * 0.37)
        assert int(flows[def_id]["vehsPerHour"]) == int(total * (1 - 0.37))


def test_demand_draw_tables_and_distribution_match_reference():
    """The demand tables equal SUMO_PARAMS (utils.py:36-49) and the seeded
    draw reproduces the weighted-choice distribution + uniform penetration
    range of sumo_env.py:566-586."""
    cfg = ScenarioConfig()
    assert tuple(cfg.veh_per_hour_main) == (4000, 4500, 5000, 5500, 6000, 6500)
    assert tuple(cfg.veh_per_hour_main_weights) == (
        0.05, 0.1, 0.15, 0.3, 0.25, 0.15)
    assert tuple(cfg.veh_per_hour_on_ramp) == (
        1400, 1500, 1600, 1700, 1800, 1900, 2000)
    assert tuple(cfg.veh_per_hour_on_ramp_weights) == (
        0.05, 0.05, 0.05, 0.15, 0.25, 0.3, 0.15)
    assert tuple(cfg.veh_per_hour_off_ramp) == (100, 300, 500)
    assert tuple(cfg.veh_per_hour_off_ramp_weights) == (0.4, 0.4, 0.2)
    assert tuple(cfg.con_penetration_rate_range) == (0.01, 0.99)

    n = 20_000
    rng = random.Random(123)
    draws = [draw_demand(cfg, rng) for _ in range(n)]
    for value, weight in zip(cfg.veh_per_hour_main,
                             cfg.veh_per_hour_main_weights):
        freq = sum(d.main_flow_vph == value for d in draws) / n
        assert freq == pytest.approx(weight, abs=0.015), value
    for value, weight in zip(cfg.veh_per_hour_off_ramp,
                             cfg.veh_per_hour_off_ramp_weights):
        freq = sum(d.off_ramp_flow_vph == value for d in draws) / n
        assert freq == pytest.approx(weight, abs=0.015), value
    pens = [d.pen_rate for d in draws]
    assert min(pens) >= 0.01 and max(pens) <= 0.99
    assert sum(pens) / n == pytest.approx(0.5, abs=0.02)  # uniform mean
