"""Full training-state checkpoints + reference-compatible .pack export.

The reference checkpoints only the network weights + 4 scalars and does NOT
persist optimizer state (SURVEY.md §5, network.py:27-47), so resumed runs
silently reset Adam moments. Here the full ``TrainState`` (params, target
params, optimizer state, counters) round-trips losslessly through flax's
msgpack serialization, while ``export_pack`` additionally writes the
reference's ``<Algo>_lr<lr>_model.pack`` file so checkpoints remain
interchangeable with the PyTorch stack in both directions
(models/packio.py)."""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
from flax import serialization

from ..config import Config
from ..models import packio


def _numpyify(tree: Any) -> Any:
    return jax.tree_util.tree_map(np.asarray, tree)


def _atomic_write(path: str, blob: bytes) -> None:
    """tmp + rename so a kill mid-write (the tunnel-hang watchdog uses
    SIGKILL) can never corrupt the only checkpoint."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)


def save_train_state(path: str, state, *, rew_mean: float = 0.0,
                     len_mean: float = 0.0, episode_count: int = 0,
                     extra_meta: dict | None = None) -> None:
    payload = {
        "state": serialization.to_state_dict(_numpyify(state)),
        "meta": {
            "rew_mean": float(rew_mean),
            "len_mean": float(len_mean),
            "episode_count": int(episode_count),
            "step": int(state.step),
            **(extra_meta or {}),
        },
    }
    _atomic_write(path, serialization.msgpack_serialize(payload))


def load_train_state(path: str, template_state):
    """Restore onto a freshly-initialized template (shapes/structure source)."""
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    state = serialization.from_state_dict(template_state, payload["state"])
    return state, dict(payload["meta"])


def run_name(cfg: Config) -> str:
    """'<Algo>_lr<lr>' — the reference's run/checkpoint naming convention
    (agent.py:44-49, parsed back at inference by observe.py:22-35)."""
    return f"{cfg.hp.algo}_lr{cfg.hp.lr}"


def pack_path(cfg: Config) -> str:
    return os.path.join(cfg.hp.save_dir, f"{run_name(cfg)}_model.pack")


def state_path(cfg: Config) -> str:
    return os.path.join(cfg.hp.save_dir, f"{run_name(cfg)}_state.msgpack")


def full_path(cfg: Config) -> str:
    return os.path.join(cfg.hp.save_dir, f"{run_name(cfg)}_full.msgpack")


# ---------------------------------------------------------------------------
# LOSSLESS checkpoints (SURVEY §7 blueprint: params + opt + step + replay
# contents + PER priorities/sum-tree + RNG). The payload is an arbitrary
# pytree — the device trainer passes its whole scanned Carry (env states,
# obs, TrainState, replay buffer incl. sum tree, RNG, n-step window), the
# host trainer (state, buffer, rng) — so kill + resume continues
# BIT-IDENTICALLY. The reference drops replay and RNG on resume
# (network.py:27-47) and silently retrains from a refilled buffer.
# ---------------------------------------------------------------------------


def save_full(path: str, payload_tree, meta: dict) -> None:
    blob = serialization.msgpack_serialize({
        "payload": serialization.to_state_dict(_numpyify(payload_tree)),
        "meta": dict(meta),
    })
    _atomic_write(path, blob)


def _migrate_heap_trees(node: Any, ndev: int = 1) -> Any:
    """Rewrite heap-format PER trees inside a restored state dict into the
    chunked format (ops/sum_tree.py). The heap leaves carry the full
    information, so the conversion is exact; it lets full checkpoints
    written before the chunked tree became the default resume seamlessly
    (the reverse — chunked payload into a heap template — is intentionally
    unsupported: set MDRLRMC_PER_TREE=heap only for fresh runs).

    ``ndev`` > 1: a DP-mesh save gathers the PER trees as ``ndev``
    CONCATENATED per-shard heaps (shard_map P(axis) layout,
    sim/distributed.py save_full). Treating that as one heap would read
    shard 0's internal nodes as leaf priorities and drop the other
    shards, so each shard's heap is converted independently and the
    chunked arrays re-concatenated in the same shard order (matching the
    chunked template's global layout)."""
    from ..ops import sum_tree as st

    if isinstance(node, dict):
        if set(node) == {"sum_tree", "max_tree", "min_tree"}:
            parts = []
            for i in range(ndev):
                heap = st.SumTreeState(**{
                    k: np.asarray(v).reshape(ndev, -1)[i]
                    for k, v in node.items()})
                parts.append(_numpyify(st.heap_to_chunked(heap)))
            merged = jax.tree_util.tree_map(
                lambda *xs: np.concatenate(xs), *parts)
            return serialization.to_state_dict(merged)
        return {k: _migrate_heap_trees(v, ndev) for k, v in node.items()}
    return node


def load_full(path: str, template_tree, ndev: int = 1):
    """Restore a full checkpoint onto a freshly-built template pytree
    (shapes/structure source). Returns (payload, meta).

    ``ndev``: dp-shard count of the SAVED payload, used only for
    heap→chunked PER-tree migration of sharded saves; the value recorded
    in the checkpoint's meta (sim/distributed.py save_full) wins when
    present."""
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    state_dict = payload["payload"]
    meta = dict(payload["meta"])
    # Heap→chunked PER-tree migration, only when the template expects the
    # chunked format (pytree node types are invisible in the state dict, so
    # consult the template's structure).
    if "ChunkedTreeState" in str(jax.tree_util.tree_structure(template_tree)):
        state_dict = _migrate_heap_trees(
            state_dict, int(meta.get("ndev", ndev)))
    tree = serialization.from_state_dict(template_tree, state_dict)
    return tree, meta


def peek_meta(path: str) -> dict:
    """Meta dict of a checkpoint. NOTE: msgpack has no lazy field access —
    this parses the whole file — so only call it on the small *_state
    checkpoints; for multi-GB *_full files use load_full (which returns
    the meta alongside the payload) and parse once."""
    with open(path, "rb") as f:
        return dict(serialization.msgpack_restore(f.read())["meta"])


def _pack_spec(cfg: Config):
    """cfg.net reconciled with the algo's flags (agents.dqn.spec_for_algo).

    The pack codec's key set depends on the spec (packio._torch_keys):
    the IQN head adds a ``tau_embed`` layer that the raw cfg.net (default
    dist_kind="c51", n_atoms=1) doesn't know about, so saving with
    cfg.net silently dropped that layer and the reconciled reader then
    failed with KeyError 'tau_embed.weight'. Lazy import: agents.dqn
    does not import runtime, but keep the cycle risk out of module load."""
    from ..agents.dqn import spec_for_algo
    spec, _ = spec_for_algo(cfg)
    return spec


def export_pack(cfg: Config, state, *, rew_mean: float = 0.0,
                len_mean: float = 0.0, episode_count: int = 0) -> str:
    path = pack_path(cfg)
    packio.save_pack(
        path, state.params, _pack_spec(cfg),
        step=int(state.step), episode_count=episode_count,
        rew_mean=rew_mean, len_mean=len_mean,
    )
    return path


def save_all(cfg: Config, state, stats, extra_meta: dict | None = None) -> None:
    kw = dict(rew_mean=stats.rew_mean, len_mean=stats.len_mean,
              episode_count=stats.count)
    save_train_state(state_path(cfg), state, extra_meta=extra_meta, **kw)
    export_pack(cfg, state, **kw)


def try_resume(cfg: Config, template_state):
    """Returns (state, meta) — full-state resume if present, else .pack
    weights-only (reference-style resume), else the fresh template."""
    sp = state_path(cfg)
    if os.path.isfile(sp):
        return load_train_state(sp, template_state)
    pp = pack_path(cfg)
    if os.path.isfile(pp):
        params, meta = packio.load_pack(pp, _pack_spec(cfg))
        state = template_state._replace(
            params=params,
            target_params=jax.tree_util.tree_map(np.copy, params),
            step=np.asarray(meta["step"], np.int32),
        )
        return state, meta
    return template_state, {"rew_mean": 0.0, "len_mean": 0.0,
                            "episode_count": 0, "step": 0}
