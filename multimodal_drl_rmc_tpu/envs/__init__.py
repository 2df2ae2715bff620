"""Environment layer: MDP, baselines, backends, wrappers, vectorization."""

from .adapter import RampEnv, make_backend
from .backend import (
    GREEN_PHASE,
    RED_PHASE,
    DemandDraw,
    TrafficBackend,
    VehicleSnapshot,
    draw_demand,
    loops_flow_vph,
    loops_flow_weighted_speed,
    loops_occupancy_percent,
)
from .baselines import (
    BASELINES,
    AlineaDsBaseline,
    AlwaysGreenBaseline,
    BaselineController,
    FixedCycleBaseline,
    PiAlineaDsBaseline,
)
from .fake_backend import FakeTrafficBackend
from .grid import build_grid, flatten_grid, grid_distance_from_start
from .rl_controller import RampMeterEnv
from .scenario import RAMP_1X3, ScenarioSpec, get_scenario, route_file_xml, write_sumo_scenario
from .vector import Monitor, SerialVecEnv, ThreadVecEnv, VecEnv, make_env
from .wrapper import GymEnvWrapper, MaxEpisodeStepsWrapper, RepeatActionWrapper

__all__ = [
    "RampEnv", "make_backend", "TrafficBackend", "VehicleSnapshot",
    "DemandDraw", "draw_demand", "GREEN_PHASE", "RED_PHASE",
    "loops_flow_vph", "loops_flow_weighted_speed", "loops_occupancy_percent",
    "BASELINES", "BaselineController", "AlwaysGreenBaseline",
    "FixedCycleBaseline", "AlineaDsBaseline", "PiAlineaDsBaseline",
    "FakeTrafficBackend", "build_grid", "flatten_grid",
    "grid_distance_from_start", "RampMeterEnv",
    "RAMP_1X3", "ScenarioSpec", "get_scenario", "route_file_xml",
    "write_sumo_scenario",
    "Monitor", "SerialVecEnv", "ThreadVecEnv", "VecEnv", "make_env",
    "GymEnvWrapper", "MaxEpisodeStepsWrapper", "RepeatActionWrapper",
]
