"""Runtime: training/eval drivers, checkpointing, metrics."""

from .checkpoint import (
    export_pack,
    load_train_state,
    pack_path,
    run_name,
    save_all,
    save_train_state,
    state_path,
    try_resume,
)
from .metrics import EpisodeStats, MetricsWriter, StepTimer
from .rollout import BaselineRunner, PolicyRunner

__all__ = [
    "export_pack", "load_train_state", "pack_path", "run_name", "save_all",
    "save_train_state", "state_path", "try_resume",
    "EpisodeStats", "MetricsWriter", "StepTimer",
    "BaselineRunner", "PolicyRunner",
]
