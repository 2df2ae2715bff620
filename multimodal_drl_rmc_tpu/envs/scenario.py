"""Scenario geometry for the ramp-metering network, as data.

One declarative ``ScenarioSpec`` drives every backend (fake, native C++,
SUMO/TraCI, on-device JAX sim) instead of the reference's approach of
hard-coding edge IDs inside the env (sumo_env.py:91-95) and shipping
hand-edited SUMO XML (env/custom_env/data/1ramp_1x3/*.xml).

``RAMP_1X3`` reproduces the reference's 1ramp_1x3 network: a 3-lane
mainline feeding a 4-lane acceleration area joined by a single-lane
metered on-ramp, with 18 induction loops (1ramp_1x3.add.xml:8-26) and the
2-phase (G/r) ramp-meter TL program (1ramp_1x3.add.xml:31-35).

``write_sumo_scenario`` emits SUMO plain-XML inputs (.nod/.edg/.con +
.add — detectors AND the TL program, matching the reference's add.xml —
+ .sumocfg) from the spec and, when a SUMO toolchain is present,
invokes ``netconvert`` to produce the .net.xml — so the TraCI backend runs
against generated assets rather than copies of the reference's.
"""

from __future__ import annotations

import os
import shutil
import subprocess
from dataclasses import dataclass
from typing import Mapping, Sequence


@dataclass(frozen=True)
class EdgeSpec:
    id: str
    from_node: str
    to_node: str
    lanes: int
    length_m: float
    speed_mps: float


@dataclass(frozen=True)
class LoopSpec:
    """Induction-loop detector (SUMO E1 equivalent)."""

    id: str
    lane: str          # "<edge>_<index>"
    pos_m: float       # position along the lane
    period_s: float = 40.0


@dataclass(frozen=True)
class ScenarioSpec:
    name: str
    edges: Sequence[EdgeSpec]
    loops: Sequence[LoopSpec]
    routes: Mapping[str, Sequence[str]]      # route id -> edge id chain
    tl_node: str                             # ramp meter junction (TL id)
    tl_controlled_edge: str                  # edge whose head stops at the TL
    # Edge roles (reference sumo_env.py:91-95)
    upstream_edge: str = "main_road"
    merging_edge: str = "acceleration_area"
    downstream_edge: str = "end_main_road"
    on_ramp_edge: str = "on_ramp"
    passage_edge: str = "passage_area"
    # Detector groups (reference rl_controller.py:31-35)
    upstream_state_loops: Sequence[str] = ()
    bottleneck_state_loops: Sequence[str] = ()
    downstream_loops: Sequence[str] = ()
    queue_loop: str = "queue_sens"

    def edge(self, edge_id: str) -> EdgeSpec:
        for e in self.edges:
            if e.id == edge_id:
                return e
        raise KeyError(edge_id)

    def lane_length(self, lane_id: str) -> float:
        edge_id, _, _idx = lane_id.rpartition("_")
        return self.edge(edge_id).length_m

    def edge_lane_count(self, edge_id: str) -> int:
        return self.edge(edge_id).lanes


# ---------------------------------------------------------------------------
# 1ramp_1x3 — geometry measured from the reference net
# (env/custom_env/data/1ramp_1x3/1ramp_1x3.net.xml lane lengths/speeds).
# ---------------------------------------------------------------------------

RAMP_1X3 = ScenarioSpec(
    name="1ramp_1x3",
    edges=(
        EdgeSpec("entry", "n_entry", "n_off_up", 3, 225.64, 27.77),
        EdgeSpec("off_ramp_up_stream", "n_off_up", "n_hwy_begin", 4, 110.83, 27.77),
        EdgeSpec("main_road", "n_hwy_begin", "n_merge_begin", 3, 488.34, 27.77),
        EdgeSpec("acceleration_area", "n_merge_begin", "n_merge_end", 4, 193.79, 22.22),
        EdgeSpec("end_main_road", "n_merge_end", "n_hwy_end", 3, 193.07, 27.77),
        EdgeSpec("on_ramp", "n_ramp_entry", "n_ramp_meter", 1, 204.44, 13.89),
        EdgeSpec("passage_area", "n_ramp_meter", "n_merge_begin", 1, 42.51, 13.89),
        EdgeSpec("off_ramp_beginning", "n_hwy_begin", "n_off_begin", 1, 64.38, 13.89),
        EdgeSpec("off_ramp", "n_off_begin", "n_off_end", 2, 161.26, 13.89),
    ),
    loops=(
        LoopSpec("bottle_neck_sens_0", "acceleration_area_0", 58.75),
        LoopSpec("bottle_neck_sens_1", "acceleration_area_1", 58.72),
        LoopSpec("bottle_neck_sens_2", "acceleration_area_2", 58.74),
        LoopSpec("bottle_neck_sens_3", "acceleration_area_3", 58.78),
        LoopSpec("demand_sens_0", "on_ramp_0", 196.99),
        LoopSpec("merge_start_sens", "acceleration_area_0", 2.59),
        LoopSpec("outflow_sens_0", "end_main_road_0", 6.92),
        LoopSpec("outflow_sens_1", "end_main_road_1", 6.80),
        LoopSpec("outflow_sens_2", "end_main_road_2", 6.74),
        LoopSpec("passage_queue_sens", "passage_area_0", 10.69),
        LoopSpec("passage_sens", "passage_area_0", 6.04),
        LoopSpec("queue_sens", "on_ramp_0", 6.04),
        LoopSpec("up_stream_sens_0", "main_road_0", 453.40),
        LoopSpec("up_stream_sens_00", "main_road_0", 445.61),
        LoopSpec("up_stream_sens_1", "main_road_1", 453.22),
        LoopSpec("up_stream_sens_11", "main_road_1", 445.27),
        LoopSpec("up_stream_sens_2", "main_road_2", 453.23),
        LoopSpec("up_stream_sens_22", "main_road_2", 445.05),
    ),
    routes={
        "entry_to_end_main_road": (
            "entry", "off_ramp_up_stream", "main_road", "acceleration_area",
            "end_main_road",
        ),
        "entry_to_off_ramp": (
            "entry", "off_ramp_up_stream", "off_ramp_beginning", "off_ramp",
        ),
        "on_ramp_to_end_main_road": (
            "on_ramp", "passage_area", "acceleration_area", "end_main_road",
        ),
    },
    tl_node="ramp_meter",
    tl_controlled_edge="on_ramp",
    upstream_state_loops=("up_stream_sens_0", "up_stream_sens_1", "up_stream_sens_2"),
    bottleneck_state_loops=(
        "bottle_neck_sens_0", "bottle_neck_sens_1",
        "bottle_neck_sens_2", "bottle_neck_sens_3",
    ),
    downstream_loops=("outflow_sens_0", "outflow_sens_1", "outflow_sens_2"),
)


def get_scenario(name: str) -> ScenarioSpec:
    if name == "1ramp_1x3":
        return RAMP_1X3
    raise KeyError(f"unknown scenario: {name}")


# ---------------------------------------------------------------------------
# SUMO plain-XML emission (for the TraCI backend)
# ---------------------------------------------------------------------------

# Schematic node coordinates; SUMO only needs a consistent embedding, the
# controller logic depends on lane lengths (taken from EdgeSpec), not shapes.
_NODE_XY = {
    "n_entry": (-1000.0, 0.0),
    "n_off_up": (-780.0, 0.0),
    "n_hwy_begin": (-670.0, 0.0),
    "n_merge_begin": (-180.0, 0.0),
    "n_merge_end": (15.0, 0.0),
    "n_hwy_end": (210.0, 0.0),
    "n_ramp_entry": (-390.0, -120.0),
    "n_ramp_meter": (-222.0, -20.0),
    "n_off_begin": (-630.0, -60.0),
    "n_off_end": (-560.0, -200.0),
}


def write_sumo_scenario(
    spec: ScenarioSpec,
    out_dir: str,
    *,
    episode_seconds: float = 3600.0,
    run_netconvert: bool = True,
) -> dict:
    """Write SUMO inputs generated from ``spec``; returns produced paths.

    Emits <name>.nod.xml / .edg.xml / .con.xml, the detector + TL-program
    .add.xml, and a .sumocfg. If ``netconvert`` is on PATH (and
    ``run_netconvert``), also builds <name>.net.xml (whose auto TL program
    "0" is superseded at load by the add.xml program "rl", mirroring the
    reference's net.xml:116-119 / add.xml:31-35 layout).
    """
    os.makedirs(out_dir, exist_ok=True)
    paths = {}

    def p(suffix: str) -> str:
        return os.path.join(out_dir, f"{spec.name}.{suffix}")

    node_types = {spec.tl_node: ' type="traffic_light" tlType="static"'}
    nod = ['<nodes>']
    for nid, (x, y) in _NODE_XY.items():
        nod.append(f'    <node id="{nid}" x="{x:.2f}" y="{y:.2f}"{node_types.get(nid, "")}/>')
    nod.append("</nodes>")
    paths["nod"] = p("nod.xml")
    _write(paths["nod"], nod)

    edg = ["<edges>"]
    for e in spec.edges:
        edg.append(
            f'    <edge id="{e.id}" from="{e.from_node}" to="{e.to_node}" '
            f'numLanes="{e.lanes}" speed="{e.speed_mps}" length="{e.length_m}"/>'
        )
    edg.append("</edges>")
    paths["edg"] = p("edg.xml")
    _write(paths["edg"], edg)

    # Connections: chain each route's consecutive edges lane-to-lane.
    con = ["<connections>"]
    seen = set()
    for chain in spec.routes.values():
        for a, b in zip(chain, chain[1:]):
            if (a, b) in seen:
                continue
            seen.add((a, b))
            ea, eb = spec.edge(a), spec.edge(b)
            for lane in range(min(ea.lanes, eb.lanes)):
                con.append(f'    <connection from="{a}" to="{b}" fromLane="{lane}" toLane="{lane}"/>')
    con.append("</connections>")
    paths["con"] = p("con.xml")
    _write(paths["con"], con)

    add = ["<additional>"]
    for loop in spec.loops:
        add.append(
            f'    <inductionLoop id="{loop.id}" lane="{loop.lane}" pos="{loop.pos_m}" '
            f'period="{loop.period_s:.2f}" file="induction_loop_data/{loop.id}.xml"/>'
        )
    # Ramp-meter TL program: G then r, shipped in the ADDITIONAL file like
    # the reference (1ramp_1x3.add.xml:31-35) — SUMO activates the
    # last-loaded program, so "rl" (not netconvert's auto program "0")
    # is current when RampMeterEnv calls setPhase(0/1).
    add += [
        f'    <tlLogic id="{spec.tl_node}" type="static" programID="rl" offset="0">',
        '        <phase duration="5" state="G"/>',
        '        <phase duration="5" state="r"/>',
        "    </tlLogic>",
    ]
    add.append("</additional>")
    paths["add"] = p("add.xml")
    _write(paths["add"], add)

    cfg = [
        "<configuration>",
        "    <input>",
        f'        <net-file value="{spec.name}.net.xml"/>',
        f'        <route-files value="{spec.name}.rou.xml"/>',
        f'        <additional-files value="{spec.name}.add.xml"/>',
        "    </input>",
        '    <time><begin value="0"/></time>',
        "    <processing>",
        '        <time-to-teleport value="-1"/>',
        '        <waiting-time-memory value="-1"/>',
        "    </processing>",
        '    <routing><device.rerouting.probability value="0"/></routing>',
        "    <report>",
        '        <verbose value="true"/>',
        '        <duration-log.statistics value="true"/>',
        '        <no-step-log value="true"/>',
        "    </report>",
        "</configuration>",
    ]
    paths["sumocfg"] = p("sumocfg")
    _write(paths["sumocfg"], cfg)

    netconvert = shutil.which("netconvert")
    if run_netconvert and netconvert:
        subprocess.run(
            [
                netconvert,
                "--node-files", paths["nod"],
                "--edge-files", paths["edg"],
                "--connection-files", paths["con"],
                "--no-turnarounds",
                "-o", p("net.xml"),
            ],
            check=True,
            capture_output=True,
        )
        paths["net"] = p("net.xml")
    return paths


def route_file_xml(
    spec: ScenarioSpec,
    *,
    main_flow_vph: int,
    on_ramp_flow_vph: int,
    off_ramp_flow_vph: int,
    pen_rate: float,
    episode_seconds: float,
    episode_index: int = 0,
    split_by_penetration: bool = False,
    v_params: Mapping[str, float] | None = None,
) -> str:
    """Route-file content for one episode (reference sumo_env.py:559-634).

    Eval mode (default) puts all-but-one vehicle per flow in the connected
    class (sumo_env.py:589-594); ``split_by_penetration`` reproduces the
    commented-out training split (sumo_env.py:597-602).
    """
    v = {"length": 5.0, "min_gap": 2.5, "accel": 2.6, "decel": 4.5,
         "max_speed": 35, "sigma_def": 0.9, "sigma_con": 0.8}
    if v_params:
        v.update(v_params)

    def split(total: int) -> tuple[int, int]:
        if split_by_penetration:
            return int(total * pen_rate), int(total * (1 - pen_rate))
        return int(total - 1), 1

    main_con, main_def = split(main_flow_vph)
    ramp_con, ramp_def = split(on_ramp_flow_vph)
    off_con, off_def = split(off_ramp_flow_vph)

    lines = [
        f"<!-- generated for episode {episode_index} -->",
        "<routes>",
        f'    <vType id="def" vClass="passenger" length="{v["length"]}" minGap="{v["min_gap"]}" '
        f'accel="{v["accel"]}" decel="{v["decel"]}" maxSpeed="{v["max_speed"]}" sigma="{v["sigma_def"]}"/>',
        f'    <vType id="con" vClass="passenger" length="{v["length"]}" minGap="{v["min_gap"]}" '
        f'accel="{v["accel"]}" decel="{v["decel"]}" maxSpeed="{v["max_speed"]}" sigma="{v["sigma_con"]}" color="1,0,0"/>',
    ]
    for rid, chain in spec.routes.items():
        lines.append(f'    <route id="{rid}" edges="{" ".join(chain)}"/>')
    flows = [
        ("main_con", "con", main_con, "entry_to_end_main_road"),
        ("main_def", "def", main_def, "entry_to_end_main_road"),
        ("on_ramp_con", "con", ramp_con, "on_ramp_to_end_main_road"),
        ("on_ramp_def", "def", ramp_def, "on_ramp_to_end_main_road"),
        ("off_ramp_con", "con", off_con, "entry_to_off_ramp"),
        ("off_ramp_def", "def", off_def, "entry_to_off_ramp"),
    ]
    for fid, vtype, vph, route in flows:
        lines.append(
            f'    <flow id="{fid}" type="{vtype}" vehsPerHour="{vph}" route="{route}" '
            f'begin="0" end="{episode_seconds:.0f}" departLane="best" departPos="random" departSpeed="max"/>'
        )
    lines.append("</routes>")
    return "\n".join(lines)


def _write(path: str, lines: Sequence[str]) -> None:
    with open(path, "w") as f:
        f.write('<?xml version="1.0" encoding="UTF-8"?>\n')
        f.write("\n".join(lines))
        f.write("\n")
