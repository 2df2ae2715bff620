"""Connected-vehicle occupancy/speed grid builder — a pure function.

Reimplements the reference's ``_create_grid_observation``
(sumo_env.py:228-302) as a stateless transform from a ``VehicleSnapshot``
to the [rows, cols, channels] grid, so it is unit-testable against
hand-placed vehicles and shared by every host backend. (The on-device JAX
simulator builds the same grid with vectorized segment ops in sim/env.py.)

Layout quirk preserved for checkpoint parity: the reference allocates the
grid HWC — np.zeros((rows, cols, channels)) with channel 0 = normalized
speed, channel 1 = occupancy — and flattens in that (row, col, channel)
order (rl_controller.py:322-327), while the network *reads* the flat
segment as a CHW (2, 27, 5) tensor (env/dqn_config.py:125-129). The mapping
is consistent between training and inference, so we reproduce it bit-for-bit
rather than "fixing" it: ``flatten_grid`` flattens in HWC order.
"""

from __future__ import annotations

import numpy as np

from ..config import GridConfig
from .backend import VehicleSnapshot
from .scenario import ScenarioSpec

# Lane -> grid column (reference sumo_env.py:240-247). Columns 0-2 are the
# mainline lanes (leftmost first), 3 the acceleration lane, 4 the ramp path.
COLUMN_MAP = {
    "main_road_2": 0, "acceleration_area_3": 0,
    "main_road_1": 1, "acceleration_area_2": 1,
    "main_road_0": 2, "acceleration_area_1": 2,
    "acceleration_area_0": 3,
    "on_ramp_0": 4,
    "passage_area_0": 4,
}


def grid_distance_from_start(
    lane_id: str, lane_pos: float, grid: GridConfig, spec: ScenarioSpec
) -> float:
    """Distance of a vehicle from the grid's upstream end, or -1 if outside.

    Mirrors the segment-offset logic of sumo_env.py:265-287: the grid covers
    the last ``pre_merge_segment_len`` metres of the approach lanes plus the
    first ``accel_segment_len`` metres of the acceleration area; the ramp
    column chains on_ramp tail -> passage_area -> acceleration_area_0.
    """
    lane_len = spec.lane_length(lane_id)
    if "on_ramp" in lane_id:
        start = lane_len - grid.on_ramp_segment_len_m
        if lane_pos >= start:
            return lane_pos - start
    elif "passage_area" in lane_id:
        return grid.on_ramp_segment_len_m + lane_pos
    elif "main_road" in lane_id:
        start = lane_len - grid.main_road_segment_len_m
        if lane_pos >= start:
            return lane_pos - start
    elif "acceleration_area" in lane_id:
        if lane_pos < grid.accel_segment_len_m:
            if lane_id == "acceleration_area_0":
                preceding = grid.on_ramp_segment_len_m + grid.passage_segment_len_m
            else:
                preceding = grid.main_road_segment_len_m
            return preceding + lane_pos
    return -1.0


def build_grid(
    snapshot: VehicleSnapshot,
    grid: GridConfig,
    spec: ScenarioSpec,
    freeflow_speed_mps: float,
) -> np.ndarray:
    """[rows, cols, channels] f32 grid; ch0 = norm speed, ch1 = occupancy.

    Rows index distance from the grid's *downstream* end (row 0 = merge),
    matching ``dist_from_grid_end`` at sumo_env.py:292-294. The first vehicle
    written into a cell wins (sumo_env.py:299-301).
    """
    out = np.zeros((grid.rows, grid.cols, grid.channels), np.float32)
    freeflow = freeflow_speed_mps if freeflow_speed_mps > 0 else 35.0
    for lane_id, pos, speed, con in zip(
        snapshot.lane_ids, snapshot.lane_pos, snapshot.speed, snapshot.is_connected
    ):
        if not con:
            continue
        col = COLUMN_MAP.get(lane_id)
        if col is None:
            continue
        dist = grid_distance_from_start(lane_id, float(pos), grid, spec)
        if dist < 0:
            continue
        dist_from_end = grid.total_length_m - dist
        row = min(int(dist_from_end / grid.cell_length_m), grid.rows - 1)
        if 0 <= row < grid.rows and out[row, col, 1] == 0:
            out[row, col, 0] = np.clip(float(speed) / freeflow, 0.0, 1.0)
            out[row, col, 1] = 1.0
    return out


def flatten_grid(grid_hwc: np.ndarray) -> np.ndarray:
    """Flatten in the reference's (row, col, channel) order
    (rl_controller.py:324)."""
    return grid_hwc.reshape(-1)
