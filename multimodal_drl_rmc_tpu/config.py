"""Unified configuration tree for the TPU-native ramp-metering DRL framework.

Replaces the reference's three-way config split (``env/custom_env/utils.py``
SUMO_PARAMS at :22-73, ``env/dqn_config.py`` HYPER_PARAMS at :26-56, and the
argparse layers in train/observe/play/evaluate) with one dataclass tree.
Every knob of the reference is preserved; defaults match the reference values.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Sequence


# ---------------------------------------------------------------------------
# Scenario / simulation config (reference: env/custom_env/utils.py:22-73)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class ScenarioConfig:
    """Traffic scenario + demand randomization parameters."""

    name: str = "1ramp_1x3"
    episode_seconds: float = 3600.0          # SUMO_PARAMS["steps"]
    sim_step_seconds: float = 1.0            # SUMO default delta-t

    # Demand distributions (weighted random choice per episode,
    # reference sumo_env.py:559-586).
    veh_per_hour_main: Sequence[int] = (4000, 4500, 5000, 5500, 6000, 6500)
    veh_per_hour_main_weights: Sequence[float] = (0.05, 0.1, 0.15, 0.3, 0.25, 0.15)
    veh_per_hour_on_ramp: Sequence[int] = (1400, 1500, 1600, 1700, 1800, 1900, 2000)
    veh_per_hour_on_ramp_weights: Sequence[float] = (0.05, 0.05, 0.05, 0.15, 0.25, 0.3, 0.15)
    veh_per_hour_off_ramp: Sequence[int] = (100, 300, 500)
    veh_per_hour_off_ramp_weights: Sequence[float] = (0.4, 0.4, 0.2)
    con_penetration_rate_range: Sequence[float] = (0.01, 0.99)
    # Driver-imperfection accel noise, m/s^2 std per substep (0 = off,
    # the historical deterministic-IDM behavior). At bistable demand
    # cells the deterministic sims' jam/free basin choice is decided by
    # arithmetic precision (BENCHMARKS "Protocol divergence RESOLVED");
    # sigma >> 1e-7 puts both the f32 device sim and the f64 native twin
    # above that floor so their stability maps coincide. SUMO's Krauss
    # model carries its own driver imperfection; the TraCI backend
    # ignores this field.
    accel_noise_sigma: float = 0.0
    generate_route_file: bool = True
    # Reference eval mode puts all-but-one vehicle in the connected class
    # (sumo_env.py:589-594); training mode splits by penetration rate
    # (commented block sumo_env.py:597-602).
    demand_split_by_penetration: bool = False

    # Vehicle physical parameters (reference route file vType defs,
    # sumo_env.py:611-612).
    v_length_m: float = 5.0
    v_min_gap_m: float = 2.5
    v_max_speed_mps: float = 35.0
    v_accel: float = 2.6
    v_decel: float = 4.5
    sigma_def: float = 0.9
    sigma_con: float = 0.8
    v_type_def: str = "def"
    v_type_con: str = "con"

    # Resilience (reference sumo_env.py:159-160)
    time_to_teleport_s: float = 300.0
    waiting_time_memory_s: float = 1000.0

    # Seeding
    fixed_seed: bool = False
    seed_value: int = 42


@dataclass(frozen=True)
class GridConfig:
    """Connected-vehicle occupancy/speed grid geometry.

    Reference: sumo_env.py:193-225 (_initialize_grid_params_from_net) and
    SUMO_PARAMS["con_range"/"cell_length"/"grid_*"].
    """

    channels: int = 2          # (speed, occupancy)
    rows: int = 27             # int(216 / 8)
    cols: int = 5
    cell_length_m: float = 8.0
    total_length_m: float = 216.0
    accel_segment_len_m: float = 84.0
    passage_segment_len_m: float = 42.51   # passage_area_0 lane length (net file)

    @property
    def pre_merge_segment_len_m(self) -> float:
        return self.total_length_m - self.accel_segment_len_m   # 132.0

    @property
    def on_ramp_segment_len_m(self) -> float:
        return self.pre_merge_segment_len_m - self.passage_segment_len_m

    @property
    def main_road_segment_len_m(self) -> float:
        return self.pre_merge_segment_len_m

    @property
    def flat_size(self) -> int:
        return self.channels * self.rows * self.cols


@dataclass(frozen=True)
class EnvConfig:
    """RL-facing MDP parameters (reference rl_controller.py:7-67)."""

    scenario: ScenarioConfig = field(default_factory=ScenarioConfig)
    grid: GridConfig = field(default_factory=GridConfig)

    cycle_seconds: float = 40.0
    green_time_actions_sec: Sequence[float] = (5.0, 10.0, 15.0, 20.0, 25.0, 30.0, 35.0, 40.0)
    macro_state_size: int = 14

    # Normalization constants (reference sumo_env.py:97-106).
    freeflow_speed_mps: float = 35.0       # SUMO_PARAMS["v_max_speed"]
    max_ramp_queue_veh: float = 25.0
    max_lane_flow_vph: float = 1900.0
    max_flow_upstream_vph: float = 5490.0
    max_flow_merging_vph: float = 5490.0
    max_flow_downstream_vph: float = 5760.0
    max_occupancy_percent: float = 100.0

    # Env-side safety envelope (0.0 = off). While the PREVIOUS control
    # cycle's merge-area occupancy exceeds guard_occ percent, the env caps
    # the applied green at action index guard_cap before mapping it to a
    # phase plan. Training-time twin of the runtime guard in
    # runtime/rollout.py PolicyRunner (BENCHMARKS "safety envelope"):
    # enabling it during training makes the envelope part of the MDP the
    # policy learns, instead of a deployment patch. First post-reset action
    # is always unguarded (matches PolicyRunner's _last_occ = 0 reset).
    guard_occ: float = 0.0
    guard_cap: int = 3

    # Reward weights (reference rl_controller.py:388-425).
    w_speed_merge: float = 1.5
    w_speed_up: float = 1.0
    w_speed_down: float = 0.5
    w_occ_bottle: float = 2.0
    w_occ_upstream: float = 1.0
    w_queue: float = 1.0
    w_spillback: float = 20.0
    spillback_threshold_frac: float = 0.9  # of max ramp queue

    # State representation variant: "hybrid" (14+grid), "macro_lane" (14),
    # "macro_no_lane" (8). Mirrors the reference's variant snapshots
    # (env/custom_env/{macro no lane, macro with lane, micro + macro lane}).
    obs_variant: str = "hybrid"

    @property
    def n_actions(self) -> int:
        return len(self.green_time_actions_sec)

    @property
    def obs_size(self) -> int:
        if self.obs_variant == "hybrid":
            return self.macro_state_size + self.grid.flat_size
        if self.obs_variant == "macro_lane":
            return self.macro_state_size
        if self.obs_variant == "macro_no_lane":
            return 8
        raise ValueError(f"unknown obs_variant: {self.obs_variant}")

    @property
    def max_agent_steps_per_episode(self) -> int:
        return int(self.scenario.episode_seconds / self.cycle_seconds)


# ---------------------------------------------------------------------------
# Learner hyper-parameters (reference env/dqn_config.py:26-56)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class HyperParams:
    n_env: int = 1
    lr: float = 1e-4
    gamma: float = 0.99
    eps_start: float = 1.0
    eps_min: float = 0.01
    eps_dec: float = 2e6
    eps_dec_exp: bool = True
    batch_size: int = 32
    min_mem: int = 100_000
    max_mem: int = 1_000_000
    target_update_freq: int = 30_000
    target_soft_update: bool = True
    target_soft_update_tau: float = 1e-3
    save_freq: int = 10_000
    log_freq: int = 4_500
    save_dir: str = "./save/1ramp_1x3/"
    log_dir: str = "./logs/train/1ramp_1x3/"
    load: bool = True
    repeat: int = 0
    max_episode_steps: int = 1000
    max_total_steps: int = 2_100_000
    algo: str = "DuelingDoubleDQNAgent"

    # PER parameters (reference dqn/replay_memory.py:43-54)
    per_epsilon: float = 1e-4
    per_alpha: float = 0.6
    per_beta_start: float = 0.4
    per_beta_end: float = 1.0
    per_max_priority: float = 1.0

    # n-step returns (TPU build extension; 1 == reference behavior)
    n_step: int = 1

    # Learning-rate schedule (TPU build extension; "const" == reference).
    # "cosine" decays lr -> lr_end over lr_decay_steps LEARNER updates
    # (0 = max_total_steps, which equals updates at replay-ratio 1).
    lr_schedule: str = "const"
    lr_end: float = 1e-6
    lr_decay_steps: int = 0

    # TPU-specific knobs
    obs_dtype: str = "float32"     # replay storage dtype for observations
    learner_devices: int = 1       # data-parallel learner shards


@dataclass(frozen=True)
class NetworkSpec:
    """Architecture spec (reference env/dqn_config.py:148-193)."""

    kind: str = "two_stream_hybrid"     # or "mlp"
    macro_len: int = 14
    micro_shape_chw: Sequence[int] = (2, 27, 5)
    cnn_filters: Sequence[int] = (32, 64, 64)
    cnn_kernels: Sequence[Sequence[int]] = ((3, 3), (3, 3), (3, 3))
    cnn_strides: Sequence[Sequence[int]] = ((1, 1), (2, 1), (2, 2))
    dense: Sequence[int] = (512, 256)
    mlp_hidden: Sequence[int] = (256, 128)  # macro-variant MLP (reference
                                            # 'macro with lane/dqn_config.py':60-105)
    activation: str = "elu"
    dueling: bool = True
    # Distributional (C51) head — TPU-build extension beyond the reference's
    # agent zoo. n_atoms == 1 keeps the scalar-Q heads; > 1 switches to
    # categorical value distributions on [v_min, v_max] (Bellemare et al.
    # 2017). The [B, A, atoms] logit tensor is MXU-friendly: one dense head
    # of width A*atoms instead of A.
    # Support calibrated against the trained flagship's observed Q range
    # (min -24, p99 +36 on a greedy episode: free-flow cycles have positive
    # speed-term rewards, congested ones negative).
    n_atoms: int = 1
    v_min: float = -30.0
    v_max: float = 45.0
    # Distributional head family when n_atoms > 1: "c51" (categorical on
    # the fixed [v_min, v_max] support), "qr" (quantile regression,
    # Dabney et al. 2017 — no support to calibrate; n_atoms = quantiles),
    # or "iqn" (implicit quantile networks, Dabney et al. 2018 — taus are
    # INPUTS embedded via cosine features, sampled fresh per loss call;
    # n_atoms = tau samples per forward; eval uses the fixed midpoint grid).
    dist_kind: str = "c51"
    iqn_embed_dim: int = 64   # cosine-embedding size n (IQN paper eq. 4)
    # NoisyNet heads (Fortunato et al. 2018, factorized Gaussian noise):
    # fc_val/fc_adv become NoisyDense and exploration comes from the learned
    # sigma instead of epsilon-greedy (the learner zeroes epsilon). Mean
    # weights (mu) keep the plain kernel/bias names, so greedy eval and the
    # Pallas dueling kernel see the deterministic mean policy unchanged.
    noisy: bool = False
    noisy_sigma0: float = 0.5
    # Parameter dtype for compute; bf16 params hurt this tiny net's stability
    # little but matmuls already run via MXU with f32 accumulation.
    dtype: str = "float32"


@dataclass(frozen=True)
class Config:
    env: EnvConfig = field(default_factory=EnvConfig)
    hp: HyperParams = field(default_factory=HyperParams)
    net: NetworkSpec = field(default_factory=NetworkSpec)

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


ALGO_NAMES = (
    "DQNAgent",
    "DoubleDQNAgent",
    "DuelingDoubleDQNAgent",
    "PerDuelingDoubleDQNAgent",
    # TPU-build extensions: distributional heads on top of the full
    # Rainbow-lite stack (double + dueling + PER; n-step via -n_step).
    "C51DuelingDQNAgent",
    "QrDuelingDQNAgent",
    "IqnDuelingDQNAgent",
    # NoisyNet exploration over the scalar flagship stack / the
    # distributional heads (full Rainbow).
    "NoisyPerDuelingDQNAgent",
    "NoisyQrDuelingDQNAgent",
    "NoisyC51DuelingDQNAgent",
    "NoisyIqnDuelingDQNAgent",
)


def network_spec_for_variant(variant: str) -> NetworkSpec:
    """Build the NetworkSpec matching a state-representation variant.

    hybrid        -> two-stream CNN+macro network (dqn_config.py:66-143)
    macro_lane    -> 14-dim MLP 256-128 (variant 'macro with lane')
    macro_no_lane -> 8-dim MLP 256-128 (variant 'macro no lane')
    """
    if variant == "hybrid":
        return NetworkSpec()
    if variant in ("macro_lane", "macro_no_lane"):
        return NetworkSpec(kind="mlp", macro_len=14 if variant == "macro_lane" else 8)
    raise ValueError(f"unknown variant: {variant}")
