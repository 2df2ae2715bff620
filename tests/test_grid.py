"""Grid-observation builder unit tests (reference sumo_env.py:228-302)."""

import numpy as np

from multimodal_drl_rmc_tpu.config import GridConfig
from multimodal_drl_rmc_tpu.envs import RAMP_1X3, VehicleSnapshot, build_grid, flatten_grid
from multimodal_drl_rmc_tpu.envs.grid import COLUMN_MAP, grid_distance_from_start

GRID = GridConfig()
FREEFLOW = 35.0


def snap(lane_ids, pos, speed, con=None):
    n = len(lane_ids)
    return VehicleSnapshot(
        lane_ids=lane_ids,
        lane_pos=np.asarray(pos, np.float32),
        speed=np.asarray(speed, np.float32),
        is_connected=np.asarray([True] * n if con is None else con, bool),
    )


def test_segment_lengths():
    assert GRID.pre_merge_segment_len_m == 132.0
    assert abs(GRID.on_ramp_segment_len_m - 89.49) < 1e-9


def test_distance_main_road():
    # main_road length 488.34; grid covers the last 132 m.
    lane_len = RAMP_1X3.lane_length("main_road_2")
    d = grid_distance_from_start("main_road_2", lane_len - 1.0, GRID, RAMP_1X3)
    assert abs(d - 131.0) < 1e-6
    # Vehicle before the covered stretch is outside the grid.
    assert grid_distance_from_start("main_road_2", 100.0, GRID, RAMP_1X3) < 0


def test_distance_ramp_chain():
    # on_ramp tail -> passage -> accel lane 0 chain continuity.
    ramp_len = RAMP_1X3.lane_length("on_ramp_0")
    start = ramp_len - GRID.on_ramp_segment_len_m
    d_end_of_ramp = grid_distance_from_start("on_ramp_0", ramp_len, GRID, RAMP_1X3)
    d_start_of_passage = grid_distance_from_start("passage_area_0", 0.0, GRID, RAMP_1X3)
    assert abs(d_end_of_ramp - GRID.on_ramp_segment_len_m) < 1e-4
    assert abs(d_start_of_passage - GRID.on_ramp_segment_len_m) < 1e-4
    d_accel0 = grid_distance_from_start("acceleration_area_0", 0.0, GRID, RAMP_1X3)
    assert abs(d_accel0 - GRID.pre_merge_segment_len_m) < 1e-4
    assert grid_distance_from_start("on_ramp_0", start - 1.0, GRID, RAMP_1X3) < 0


def test_accel_area_outside_segment():
    assert grid_distance_from_start("acceleration_area_1", 85.0, GRID, RAMP_1X3) < 0


def test_build_grid_placement_and_normalization():
    lane_len = RAMP_1X3.lane_length("main_road_2")
    g = build_grid(
        snap(["main_road_2"], [lane_len - 1.0], [17.5]), GRID, RAMP_1X3, FREEFLOW
    )
    # dist_from_start 131 -> dist_from_end 85 -> row 10; col 0.
    assert g[10, 0, 1] == 1.0
    assert abs(g[10, 0, 0] - 0.5) < 1e-6
    assert g.sum() == g[10, 0, 0] + g[10, 0, 1]


def test_build_grid_first_writer_wins():
    lane_len = RAMP_1X3.lane_length("main_road_2")
    g = build_grid(
        snap(["main_road_2", "main_road_2"], [lane_len - 1.0, lane_len - 2.0], [35.0, 0.0]),
        GRID, RAMP_1X3, FREEFLOW,
    )
    assert abs(g[10, 0, 0] - 1.0) < 1e-6  # first vehicle kept


def test_build_grid_ignores_unconnected_and_unknown_lanes():
    lane_len = RAMP_1X3.lane_length("main_road_2")
    g = build_grid(
        snap(
            ["main_road_2", "end_main_road_0"],
            [lane_len - 1.0, 3.0],
            [10.0, 10.0],
            con=[False, True],
        ),
        GRID, RAMP_1X3, FREEFLOW,
    )
    assert g.sum() == 0.0


def test_column_map_covers_grid_lanes():
    assert set(COLUMN_MAP.values()) == {0, 1, 2, 3, 4}


def test_flatten_order_is_hwc():
    g = np.zeros((GRID.rows, GRID.cols, GRID.channels), np.float32)
    g[0, 1, 0] = 7.0  # row 0, col 1, ch 0 -> flat index 1*2 + 0 = 2
    flat = flatten_grid(g)
    assert flat.shape == (GRID.flat_size,)
    assert flat[2] == 7.0
