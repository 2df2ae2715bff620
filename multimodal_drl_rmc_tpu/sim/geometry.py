"""Static geometry for the on-device simulator, derived from ScenarioSpec.

The corridor is modeled as 5 independent FIFO lane-chains (no within-lane
overtaking, so car-following preserves order and each chain is a ring
buffer — the key property that makes the sim a fixed-shape, sort-free JAX
program):

  chain 0..2 : mainline lanes 0..2
               entry -> off_ramp_up_stream -> main_road ->
               acceleration_area lane (i+1) -> end_main_road lane i
  chain 3    : metered ramp path
               on_ramp -> passage_area -> acceleration_area lane 0 ->
               (merged continuation over end_main_road lane 0)
  chain 4    : off-ramp path (the auxiliary right lane)
               entry -> off_ramp_up_stream -> off_ramp_beginning -> off_ramp

Merging is modeled by *coupling*, not by buffer transfers: over the
acceleration area and downstream, chain 3 and chain 0 vehicles see each
other as potential leaders through the coordinate offset
``MERGE_OFFSET_M`` (a zipper merge). This reproduces the capacity drop at
the bottleneck — 4 approach streams into 3 downstream lanes — without any
dynamic-shape vehicle exchange.

All positions are chain coordinates (metres from chain start). Derivations
reference the lane lengths of the SUMO net the reference ships
(SURVEY.md §1 L0; envs/scenario.py RAMP_1X3).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

from ..envs.scenario import RAMP_1X3, ScenarioSpec

N_CHAINS = 5
SLOTS = 256            # ring capacity per chain (mainline jam ~ 162 vehicles)
MAX_SEGMENTS = 5
LOOPS_PER_CHAIN = 8

VEH_LENGTH_M = 5.0
MIN_GAP_M = 2.5
SPACING_M = VEH_LENGTH_M + MIN_GAP_M


class ChainGeometry(NamedTuple):
    """Static (host-built, device-resident) geometry tables."""

    chain_length: np.ndarray        # [C] f32
    seg_end: np.ndarray             # [C, S] f32 — cumulative segment ends (inf-padded)
    seg_speed: np.ndarray           # [C, S] f32 — speed limit per segment
    stop_line: np.ndarray           # [C] f32 — TL stop line (inf if none)
    merge_offset: float             # chain3 coords + offset = chain0 coords
    merge_zone_lo: float            # chain3 coord where coupling starts
    ramp_accel_start: float         # chain3 coord where the accel lane begins
    # Detector tables: loop -> (chain, chain position)
    loop_names: tuple
    loop_chain: np.ndarray          # [L] int32
    loop_pos: np.ndarray            # [L] f32
    # Chain-major layout: [C, LOOPS_PER_CHAIN] position table (pad -1e9) and
    # name -> (chain, slot). Keeps the per-step detector pass gather-free.
    loop_table_pos: np.ndarray
    loop_slot: dict
    ramp_edge_end: float            # chain3 coord of on_ramp end (queue edge)
    # Grid mapping (chain coords of the grid's upstream end per chain)
    grid_start: np.ndarray          # [C] f32 — chain coord where grid begins
    grid_total_m: float
    freeflow_tt: np.ndarray         # [C] f32 — free-flow travel time per chain


# Edge chains per lane-chain class (shared with the native backend's
# chain-coordinate <-> lane-id mapping, envs/backends/native.py).
MAIN_CHAIN_EDGES = ("entry", "off_ramp_up_stream", "main_road",
                    "acceleration_area", "end_main_road")
RAMP_CHAIN_EDGES = ("on_ramp", "passage_area", "acceleration_area",
                    "end_main_road")
OFF_CHAIN_EDGES = ("entry", "off_ramp_up_stream", "off_ramp_beginning",
                   "off_ramp")


def build_geometry(spec: ScenarioSpec = RAMP_1X3) -> ChainGeometry:
    e = {edge.id: edge for edge in spec.edges}

    def chain(*edge_ids, lane_speed_override=None):
        lengths = [e[i].length_m for i in edge_ids]
        speeds = [e[i].speed_mps for i in edge_ids]
        if lane_speed_override:
            speeds = lane_speed_override
        ends = np.cumsum(lengths)
        return ends, speeds

    main_edges = MAIN_CHAIN_EDGES
    ramp_edges = RAMP_CHAIN_EDGES
    off_edges = OFF_CHAIN_EDGES

    seg_end = np.full((N_CHAINS, MAX_SEGMENTS), np.inf, np.float32)
    seg_speed = np.full((N_CHAINS, MAX_SEGMENTS), 27.77, np.float32)
    chain_length = np.zeros((N_CHAINS,), np.float32)

    for c in range(3):
        ends, speeds = chain(*main_edges)
        seg_end[c, : len(ends)] = ends
        seg_speed[c, : len(speeds)] = speeds
        chain_length[c] = ends[-1]
    ends, speeds = chain(*ramp_edges)
    seg_end[3, : len(ends)] = ends
    seg_speed[3, : len(speeds)] = speeds
    chain_length[3] = ends[-1]
    ends, speeds = chain(*off_edges)
    seg_end[4, : len(ends)] = ends
    seg_speed[4, : len(speeds)] = speeds
    chain_length[4] = ends[-1]

    stop_line = np.full((N_CHAINS,), np.inf, np.float32)
    stop_line[3] = e["on_ramp"].length_m  # 204.44 — the ramp meter

    # Chain coordinate of acceleration_area start on main chains vs ramp.
    main_accel_start = (e["entry"].length_m + e["off_ramp_up_stream"].length_m
                        + e["main_road"].length_m)                   # 824.81
    ramp_accel_start = e["on_ramp"].length_m + e["passage_area"].length_m  # 246.95
    merge_offset = main_accel_start - ramp_accel_start               # 577.86
    # The physical conflict is where the acceleration lane ENDS: ramp
    # vehicles ride their own lane through most of the accel area and must
    # zipper into mainline lane 0 over its last stretch.
    merge_conflict_len = 60.0
    merge_zone_lo = (ramp_accel_start + e["acceleration_area"].length_m
                     - merge_conflict_len)                           # 380.74

    # Loop positions in chain coordinates. Lane index on acceleration_area:
    # lane 0 is the ramp continuation (chain 3), lanes 1..3 are main 0..2.
    def main_chain_pos(edge_id: str, pos: float, lane_idx: int) -> tuple[int, float]:
        if edge_id == "main_road":
            return lane_idx, e["entry"].length_m + e["off_ramp_up_stream"].length_m + pos
        if edge_id == "acceleration_area":
            if lane_idx == 0:
                return 3, ramp_accel_start + pos
            return lane_idx - 1, main_accel_start + pos
        if edge_id == "end_main_road":
            return lane_idx, main_accel_start + e["acceleration_area"].length_m + pos
        if edge_id == "on_ramp":
            return 3, pos
        if edge_id == "passage_area":
            return 3, e["on_ramp"].length_m + pos
        raise KeyError(edge_id)

    loop_names, loop_chain, loop_pos = [], [], []
    for loop in spec.loops:
        edge_id, _, lane_idx = loop.lane.rpartition("_")
        c, p = main_chain_pos(edge_id, loop.pos_m, int(lane_idx))
        loop_names.append(loop.id)
        loop_chain.append(c)
        loop_pos.append(p)
    # Ramp traffic also crosses the outflow line (post-merge, end lane 0):
    # mirror outflow_sens_0 onto chain 3 at the offset coordinate.
    out0 = loop_names.index("outflow_sens_0")
    loop_names.append("outflow_sens_0@ramp")
    loop_chain.append(3)
    loop_pos.append(loop_pos[out0] - merge_offset)

    # Grid upstream end per chain: pre-merge grid covers the 132 m before
    # the accel area plus its first 84 m (GridConfig); chain coords:
    grid_total = 216.0
    grid_start = np.full((N_CHAINS,), np.inf, np.float32)
    grid_start[0] = grid_start[1] = grid_start[2] = main_accel_start - 132.0
    grid_start[3] = ramp_accel_start - 132.0
    grid_end_coord = main_accel_start + 84.0

    loop_table_pos = np.full((N_CHAINS, LOOPS_PER_CHAIN), -1e9, np.float32)
    loop_slot = {}
    fill = [0] * N_CHAINS
    for name, c, p in zip(loop_names, loop_chain, loop_pos):
        k = fill[c]
        assert k < LOOPS_PER_CHAIN, "raise LOOPS_PER_CHAIN"
        loop_table_pos[c, k] = p
        loop_slot[name] = (c, k)
        fill[c] += 1

    freeflow_tt = np.zeros((N_CHAINS,), np.float32)
    for c in range(N_CHAINS):
        ends = seg_end[c][np.isfinite(seg_end[c])]
        lens = np.diff(np.concatenate([[0.0], ends]))
        freeflow_tt[c] = float(np.sum(lens / seg_speed[c, : len(lens)]))

    return ChainGeometry(
        chain_length=chain_length,
        seg_end=seg_end,
        seg_speed=seg_speed,
        stop_line=stop_line,
        merge_offset=float(merge_offset),
        merge_zone_lo=float(merge_zone_lo),
        ramp_accel_start=float(ramp_accel_start),
        loop_names=tuple(loop_names),
        loop_chain=np.asarray(loop_chain, np.int32),
        loop_pos=np.asarray(loop_pos, np.float32),
        loop_table_pos=loop_table_pos,
        loop_slot=loop_slot,
        ramp_edge_end=float(e["on_ramp"].length_m),
        grid_start=grid_start,
        grid_total_m=grid_total,
        freeflow_tt=freeflow_tt,
    )


GEO = build_geometry()
