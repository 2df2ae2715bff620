"""Training observability: scalar metrics + per-stage step timing.

The reference logs three tensorboard scalars (AvgRew / AvgEpLen / Episodes,
agent.py:141-143) and wall-clock prints. Here:

  * ``MetricsWriter`` — tensorboard event files when available (same tag
    names, so the reference's `bin/visualize.sh` workflow still applies)
    plus an always-on JSONL stream that needs no reader dependencies;
  * ``StepTimer`` — sim/host/device phase breakdown per step, the
    profiling the reference lacks (SURVEY.md §5 'tracing: none'). Use with
    ``jax.profiler`` traces for deep dives; this gives the cheap always-on
    split showing whether SUMO/host or the TPU learner bounds throughput.
"""

from __future__ import annotations

import json
import os
import time
from collections import defaultdict, deque
from contextlib import contextmanager


class MetricsWriter:
    def __init__(self, log_dir: str, run_name: str, use_tensorboard: bool = True):
        self.dir = os.path.join(log_dir, run_name)
        os.makedirs(self.dir, exist_ok=True)
        self._jsonl = open(os.path.join(self.dir, "metrics.jsonl"), "a", buffering=1)
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(self.dir)
            except Exception:
                self._tb = None

    def scalar(self, tag: str, value: float, step: int) -> None:
        self._jsonl.write(json.dumps({"tag": tag, "value": float(value), "step": int(step)}) + "\n")
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)

    def scalars(self, values: dict, step: int) -> None:
        for tag, value in values.items():
            self.scalar(tag, value, step)

    def close(self) -> None:
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()


class StepTimer:
    """Accumulates wall-clock per named phase; snapshot() returns averages.

    NB: when timing jitted device work, block on the result first
    (jax.block_until_ready) or the 'device' bucket only measures dispatch.
    """

    def __init__(self, window: int = 200):
        self._buckets: dict[str, deque] = defaultdict(lambda: deque(maxlen=window))

    @contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._buckets[name].append(time.perf_counter() - t0)

    def snapshot(self) -> dict:
        out = {}
        for name, values in self._buckets.items():
            if values:
                out[f"time/{name}_ms"] = 1e3 * sum(values) / len(values)
        return out


class EpisodeStats:
    """Rolling episode return/length means (reference agent.py:33-36,130-143
    keeps deques of the last 100 episodes for AvgRew/AvgEpLen)."""

    def __init__(self, window: int = 100):
        self.returns: deque = deque(maxlen=window)
        self.lengths: deque = deque(maxlen=window)
        self.count = 0

    def push_from_infos(self, infos) -> None:
        for info in infos:
            ep = info.get("episode")
            if ep:
                self.returns.append(ep["r"])
                self.lengths.append(ep["l"])
                self.count += 1

    def seed(self, rew_mean: float, len_mean: float, count: int) -> None:
        """Resume behavior (reference agent.py:112-121): pre-fill the rolling
        means with the checkpointed values."""
        if count > 0:
            self.returns.append(rew_mean)
            self.lengths.append(len_mean)
            self.count = count

    @property
    def rew_mean(self) -> float:
        return sum(self.returns) / len(self.returns) if self.returns else 0.0

    @property
    def len_mean(self) -> float:
        return sum(self.lengths) / len(self.lengths) if self.lengths else 0.0
