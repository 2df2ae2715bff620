"""Drivers: trainer loop, checkpoint round-trip, rollout runners, evaluate
harness (reference train.py / observe.py / play.py / evaluate.py)."""

import os

import numpy as np
import pandas as pd
import pytest

from multimodal_drl_rmc_tpu.agents.dqn import make_learner
from multimodal_drl_rmc_tpu.config import (
    Config,
    EnvConfig,
    HyperParams,
    ScenarioConfig,
    network_spec_for_variant,
)
from multimodal_drl_rmc_tpu.runtime import checkpoint
from multimodal_drl_rmc_tpu.runtime.evaluate import evaluate_strategy
from multimodal_drl_rmc_tpu.runtime.rollout import BaselineRunner, PolicyRunner
from multimodal_drl_rmc_tpu.runtime.train import Trainer


def tiny_cfg(tmp_path, algo="DuelingDoubleDQNAgent", episode_s=200.0, **hp_kw):
    hp = dict(
        algo=algo, batch_size=8, min_mem=12, max_mem=64,
        max_total_steps=6, save_freq=4, log_freq=3, load=False,
        save_dir=str(tmp_path / "save") + "/", log_dir=str(tmp_path / "logs") + "/",
        max_episode_steps=0, eps_dec=100.0,
    )
    hp.update(hp_kw)
    return Config(
        env=EnvConfig(scenario=ScenarioConfig(episode_seconds=episode_s)),
        hp=HyperParams(**hp),
    )


def test_trainer_end_to_end(tmp_path):
    cfg = tiny_cfg(tmp_path)
    trainer = Trainer(cfg, backend="fake", threaded=False)
    trainer.run()
    # Checkpoints written (both full state and reference .pack).
    assert os.path.isfile(checkpoint.state_path(cfg))
    assert os.path.isfile(checkpoint.pack_path(cfg))
    # Metrics stream exists.
    run_dir = os.path.join(cfg.hp.log_dir, checkpoint.run_name(cfg))
    assert os.path.isfile(os.path.join(run_dir, "metrics.jsonl"))
    assert int(trainer.state.step) >= cfg.hp.max_total_steps


def test_trainer_resume_restores_step_and_opt_state(tmp_path):
    cfg = tiny_cfg(tmp_path)
    t1 = Trainer(cfg, backend="fake", threaded=False)
    t1.run()
    buf_size_1 = int(t1.buffer.size) if hasattr(t1.buffer, "size") \
        else int(t1.buffer.data.size)
    cfg2 = cfg.replace(hp=HyperParams(**{**cfg.hp.__dict__, "load": True}))
    t2 = Trainer(cfg2, backend="fake", threaded=False)
    assert t2.resume_step >= cfg.hp.max_total_steps
    assert int(t2.state.step) == t2.resume_step
    # Lossless resume: replay contents + RNG restored from the full
    # checkpoint, so warm-up refill is skipped.
    assert t2.full_resumed
    buf2 = t2.buffer if hasattr(t2.buffer, "size") else t2.buffer.data
    assert int(buf2.size) == buf_size_1
    np.testing.assert_array_equal(np.asarray(t2.rng), np.asarray(t1.rng))
    obses = t2.warmup()
    assert obses is not None  # refill skipped, env reset only
    # Adam moments restored (non-zero after prior training).
    mu_leaves = [np.asarray(x) for x in
                 __import__("jax").tree_util.tree_leaves(t2.state.opt_state)]
    assert any(np.abs(leaf).sum() > 0 for leaf in mu_leaves if leaf.ndim > 0)


def test_checkpoint_pack_weights_roundtrip(tmp_path):
    cfg = tiny_cfg(tmp_path)
    learner = make_learner(cfg)
    import jax

    state = learner.init_state(jax.random.PRNGKey(0))
    checkpoint.save_all(cfg, state, _FakeStats())
    # .pack reloads into identical params via the torch-layout round trip.
    from multimodal_drl_rmc_tpu.models import packio

    params, meta = packio.load_pack(checkpoint.pack_path(cfg), cfg.net)
    orig = jax.tree_util.tree_leaves(state.params)
    loaded = jax.tree_util.tree_leaves(params)
    for a, b in zip(orig, loaded):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


class _FakeStats:
    rew_mean = 1.5
    len_mean = 10.0
    count = 3


def test_export_pack_iqn_reconciled_spec(tmp_path):
    """export_pack must save with the algo-reconciled spec, not the raw
    cfg.net: the IQN head is the one family whose pack KEY SET depends on
    the spec (tau_embed), so saving with cfg.net (default c51/n_atoms=1)
    silently dropped the layer and every reader that reconstructs the
    spec from the algo name (PolicyRunner, eval_snapshots) then died with
    KeyError 'tau_embed.weight'. Regression for the round-3 IQN sweep."""
    cfg = tiny_cfg(tmp_path, algo="IqnDuelingDQNAgent")
    learner = make_learner(cfg)
    import jax

    state = learner.init_state(jax.random.PRNGKey(0))
    pack = checkpoint.export_pack(cfg, state)
    from multimodal_drl_rmc_tpu.models import packio

    with open(pack, "rb") as f:
        payload = packio.unpack_bytes(f.read())
    assert "tau_embed.weight" in payload["parameters"]
    # The production read path (spec rebuilt from the pack filename).
    runner = PolicyRunner(pack, backend="fake", cfg=cfg)
    orig = jax.tree_util.tree_leaves(state.params)
    loaded = jax.tree_util.tree_leaves(runner.params)
    assert len(orig) == len(loaded)
    for a, b in zip(orig, loaded):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    runner.close()


def test_policy_runner_episode(tmp_path):
    cfg = tiny_cfg(tmp_path)
    learner = make_learner(cfg)
    import jax

    state = learner.init_state(jax.random.PRNGKey(0))
    pack = checkpoint.export_pack(cfg, state)
    runner = PolicyRunner(pack, backend="fake", cfg=cfg)
    info = runner.run_episode(seed=3)
    assert info["l"] == 5  # 200 s / 40 s cycles
    runner.close()


def test_baseline_runner_episode(tmp_path):
    cfg = tiny_cfg(tmp_path, episode_s=120.0)
    runner = BaselineRunner("FixedCycleBaseline", backend="fake", cfg=cfg)
    info = runner.run_episode(seed=1)
    assert info["l"] == 120  # 1 Hz stepping
    runner.close()


def test_evaluate_strategy_baseline(tmp_path):
    cfg = tiny_cfg(tmp_path, episode_s=120.0)
    df = evaluate_strategy(
        "AlineaDsBaseline", num_episodes=2, master_seed=7,
        output_dir=str(tmp_path / "results"), backend="fake", cfg=cfg,
    )
    assert len(df) == 2
    assert list(df["seed"]) == [7, 8]
    for col in ("main_flow_vph", "con_penetration_rate", "total_throughput",
                "total_travel_time", "avg_time_loss", "total_co2_mg",
                "avg_ramp_queue_veh", "total_spillback_time_sec",
                "demand_loaded", "service_rate"):
        assert col in df.columns, col
    out = tmp_path / "results" / "results_AlineaDsBaseline.csv"
    assert out.is_file()
    # Seeded episodes differ (different demand draws) but are reproducible.
    df2 = evaluate_strategy(
        "AlineaDsBaseline", num_episodes=2, master_seed=7,
        output_dir=str(tmp_path / "results2"), backend="fake", cfg=cfg,
    )
    pd.testing.assert_frame_equal(df, df2)


def test_evaluate_strategy_dqn(tmp_path):
    cfg = tiny_cfg(tmp_path, episode_s=120.0)
    learner = make_learner(cfg)
    import jax

    state = learner.init_state(jax.random.PRNGKey(1))
    pack = checkpoint.export_pack(cfg, state)
    df = evaluate_strategy(
        "DQNAgent", num_episodes=1, master_seed=11, model_path=pack,
        output_dir=str(tmp_path / "results"), backend="fake", cfg=cfg,
    )
    assert len(df) == 1
    assert "avg_mainline_speed_mergeArea_km/h" in df.columns


def test_macro_variant_policy(tmp_path):
    cfg = tiny_cfg(tmp_path).replace(
        env=EnvConfig(scenario=ScenarioConfig(episode_seconds=120.0),
                      obs_variant="macro_no_lane"),
        net=network_spec_for_variant("macro_no_lane"),
    )
    learner = make_learner(cfg)
    import jax

    state = learner.init_state(jax.random.PRNGKey(0))
    pack = checkpoint.export_pack(cfg, state)
    runner = PolicyRunner(pack, backend="fake", obs_variant="macro_no_lane", cfg=cfg)
    info = runner.run_episode(seed=0)
    assert info["l"] == 3
    runner.close()


def test_evaluate_pen_rate_freeze_and_tag(tmp_path):
    """Detection-ablation plumbing: --pen-rate freezes the per-episode CV
    penetration draw and --tag suffixes the results CSV."""
    import pandas as pd

    from multimodal_drl_rmc_tpu.config import Config, EnvConfig, ScenarioConfig
    from multimodal_drl_rmc_tpu.runtime.evaluate import evaluate_strategy

    cfg = Config(env=EnvConfig(scenario=ScenarioConfig(episode_seconds=120.0)))
    df = evaluate_strategy(
        "FixedCycleBaseline", num_episodes=2, master_seed=7,
        output_dir=str(tmp_path), backend="fake", cfg=cfg,
        pen_rate=1.0, tag="Full",
    )
    assert (df["con_penetration_rate"] == 1.0).all()
    assert (tmp_path / "results_FixedCycleBaselineFull.csv").exists()


@pytest.mark.slow
def test_device_trainer_periodic_saves_and_snapshots(tmp_path, monkeypatch):
    """run() checkpoints mid-run (a host failure costs minutes, not the run)
    and copies step-tagged snapshot packs at the SNAPSHOT_EVERY cadence."""
    import glob

    from multimodal_drl_rmc_tpu.sim.train_on_device import DeviceTrainer

    monkeypatch.setattr(DeviceTrainer, "SAVE_MIN_ITERS", 32)
    monkeypatch.setattr(DeviceTrainer, "SNAPSHOT_EVERY", 128)
    cfg = Config(
        env=EnvConfig(scenario=ScenarioConfig(episode_seconds=120.0)),
        hp=HyperParams(batch_size=8, min_mem=8, max_mem=512, save_freq=1,
                       load=False, max_total_steps=200,
                       save_dir=str(tmp_path / "save") + "/",
                       log_dir=str(tmp_path / "logs") + "/"),
    )
    tr = DeviceTrainer(cfg, batch=2, replay_ratio=1.0)
    tr.run(log=False)  # NO final save() call — files must come from run()
    assert os.path.isfile(checkpoint.pack_path(cfg))
    assert os.path.isfile(checkpoint.state_path(cfg))
    snaps = glob.glob(str(tmp_path / "save" / "*_step*k_model.pack"))
    # 100 iters at batch=2, saves every 32 iters -> crosses 128 env steps.
    assert snaps, "expected at least one step-tagged snapshot pack"


@pytest.mark.slow
def test_device_trainer_full_save_knob(tmp_path, monkeypatch):
    """Periodic lossless full-Carry saves are opt-in: pulling the multi-GB
    replay through the tunnel measured ~8 min of stalled training per save,
    so run() writes *_full.msgpack only when MDRLRMC_FULL_SAVE_EVERY is set
    (env steps), and never by default."""
    from multimodal_drl_rmc_tpu.sim.train_on_device import DeviceTrainer

    monkeypatch.setattr(DeviceTrainer, "SAVE_MIN_ITERS", 32)
    base = dict(batch_size=8, min_mem=8, max_mem=512, save_freq=1,
                load=False, max_total_steps=200)
    for every, expect in (("", False), ("128", True)):
        sub = tmp_path / ("on" if expect else "off")
        cfg = Config(
            env=EnvConfig(scenario=ScenarioConfig(episode_seconds=120.0)),
            hp=HyperParams(save_dir=str(sub / "save") + "/",
                           log_dir=str(sub / "logs") + "/", **base),
        )
        if every:
            monkeypatch.setenv("MDRLRMC_FULL_SAVE_EVERY", every)
        else:
            monkeypatch.delenv("MDRLRMC_FULL_SAVE_EVERY", raising=False)
        DeviceTrainer(cfg, batch=2, replay_ratio=1.0).run(log=False)
        assert os.path.isfile(checkpoint.full_path(cfg)) == expect


@pytest.mark.slow
def test_device_trainer_resume_continues_step_accounting(tmp_path, monkeypatch):
    """A resumed DeviceTrainer continues GLOBAL env-step accounting: new
    snapshot tags extend the sequence instead of re-writing earlier
    _step<N>k packs with later-trained weights (which would corrupt the
    snapshot-sweep checkpoint selection), and the budget is total steps,
    not a fresh budget per resume."""
    import glob

    from multimodal_drl_rmc_tpu.sim.train_on_device import DeviceTrainer

    monkeypatch.setattr(DeviceTrainer, "SAVE_MIN_ITERS", 32)
    monkeypatch.setattr(DeviceTrainer, "SNAPSHOT_EVERY", 1000)
    base_hp = dict(batch_size=8, min_mem=8, max_mem=512, save_freq=1,
                   save_dir=str(tmp_path / "save") + "/",
                   log_dir=str(tmp_path / "logs") + "/")
    cfg1 = Config(
        env=EnvConfig(scenario=ScenarioConfig(episode_seconds=120.0)),
        hp=HyperParams(load=False, max_total_steps=2000, **base_hp),
    )
    DeviceTrainer(cfg1, batch=8, replay_ratio=1.0).run(log=False)
    snaps1 = sorted(glob.glob(str(tmp_path / "save" / "*_step*k_model.pack")))
    assert snaps1, "first run should have written a step-tagged snapshot"
    mtimes1 = {p: os.path.getmtime(p) for p in snaps1}
    # Full-state checkpoint carries the env-step counter.
    _, meta = checkpoint.load_train_state(
        checkpoint.state_path(cfg1),
        make_learner(cfg1).init_state(__import__("jax").random.PRNGKey(0)))
    assert meta.get("env_steps", 0) > 0

    import dataclasses
    cfg2 = cfg1.replace(hp=dataclasses.replace(
        cfg1.hp, load=True, max_total_steps=4000))
    tr2 = DeviceTrainer(cfg2, batch=8, replay_ratio=1.0)
    tr2.run(log=False)
    assert tr2.start_env_steps == meta["env_steps"]
    snaps2 = sorted(glob.glob(str(tmp_path / "save" / "*_step*k_model.pack")))
    new = [p for p in snaps2 if p not in mtimes1]
    assert new, "resumed run should extend the snapshot sequence"
    for p, t in mtimes1.items():
        assert os.path.getmtime(p) == t, \
            f"resume must not overwrite earlier snapshot {p}"


@pytest.mark.parametrize("algo,n_step", [("PerDuelingDoubleDQNAgent", 3),
                                         ("DuelingDoubleDQNAgent", 1)])
def test_device_trainer_lossless_resume_is_bit_identical(tmp_path, algo, n_step):
    """Kill + resume from a full-Carry checkpoint continues BIT-IDENTICALLY
    (SURVEY §7 blueprint: params + opt + step + replay + PER sum tree +
    RNG + env states; the reference drops replay/RNG, network.py:27-47):
    training k more supersteps from the restored carry produces exactly
    the params, replay contents and RNG stream the uninterrupted run does."""
    import dataclasses

    import jax

    from multimodal_drl_rmc_tpu.sim.train_on_device import DeviceTrainer

    cfg = Config(
        env=EnvConfig(scenario=ScenarioConfig(episode_seconds=120.0)),
        hp=HyperParams(algo=algo, n_step=n_step, batch_size=8, min_mem=16,
                       max_mem=256, save_freq=0, log_freq=0, load=False,
                       save_dir=str(tmp_path / "save") + "/",
                       log_dir=str(tmp_path / "logs") + "/"),
    )
    tr_a = DeviceTrainer(cfg, batch=4, seed=7, replay_ratio=1.0)
    carry = tr_a.init_carry()
    carry = tr_a._warm_chunk(carry, 4, False)
    carry, _ = tr_a._train_chunk(carry)
    tr_a.env_steps_done = 4 * (4 + tr_a.CHUNK)
    tr_a.save_full(carry)

    # Uninterrupted branch: two more supersteps.
    cont_a, _ = tr_a._train_chunk(carry)
    cont_a, _ = tr_a._train_chunk(cont_a)

    # Killed + resumed branch.
    cfg_b = cfg.replace(hp=dataclasses.replace(cfg.hp, load=True))
    tr_b = DeviceTrainer(cfg_b, batch=4, seed=99, replay_ratio=1.0)
    carry_b = tr_b.init_carry()
    assert tr_b.full_resumed
    assert tr_b.start_env_steps == tr_a.env_steps_done
    cont_b, _ = tr_b._train_chunk(carry_b)
    cont_b, _ = tr_b._train_chunk(cont_b)

    def tree_equal(a, b):
        la = jax.tree_util.tree_leaves(a)
        lb = jax.tree_util.tree_leaves(b)
        assert len(la) == len(lb)
        for x, y in zip(la, lb):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    tree_equal(cont_a.train_state.params, cont_b.train_state.params)
    tree_equal(cont_a.train_state.opt_state, cont_b.train_state.opt_state)
    tree_equal(cont_a.buffer, cont_b.buffer)          # replay + PER tree
    tree_equal(cont_a.rng, cont_b.rng)                # RNG stream
    tree_equal(cont_a.env_states, cont_b.env_states)  # sim state
    if n_step > 1:
        tree_equal(cont_a.nstep, cont_b.nstep)        # n-step FIFO window


@pytest.mark.parametrize("algo", ["C51DuelingDQNAgent", "QrDuelingDQNAgent",
                                  "NoisyPerDuelingDQNAgent"])
def test_distributional_policy_runner_roundtrip(tmp_path, algo):
    """Distributional extensions (C51/QR): learner trains, pack round-trips
    via the torch-layout codec, and PolicyRunner rebuilds the 51-atom head
    from the filename convention + checkpoint head width."""
    import jax

    cfg = tiny_cfg(tmp_path, algo=algo)
    learner = make_learner(cfg)
    state = learner.init_state(jax.random.PRNGKey(0))
    buf = learner.init_buffer()
    rng = jax.random.PRNGKey(1)
    import jax.numpy as jnp

    from multimodal_drl_rmc_tpu.ops.losses import Batch
    obs = jax.random.uniform(rng, (16, cfg.env.obs_size))
    buf = learner.insert(buf, Batch(
        obs=obs, action=jnp.zeros(16, jnp.int32), reward=jnp.ones(16),
        done=jnp.ones(16), next_obs=obs))
    state, buf, m = learner.train_step(state, buf, rng)
    assert np.isfinite(float(m.loss))
    cfg_net = learner.cfg.replace(net=learner.net.spec)
    pack = checkpoint.export_pack(cfg_net, state)
    runner = PolicyRunner(pack, backend="fake", cfg=cfg)
    info = runner.run_episode(seed=3)
    assert info["l"] == 5
    runner.close()


def test_cli_distributional_flags_reach_network_spec():
    """-n_atoms/-v_min/-v_max flow from the CLI into the reconciled
    NetworkSpec (sweep surface added in round 3); scalar algos ignore
    them."""
    import argparse

    from multimodal_drl_rmc_tpu.agents.dqn import spec_for_algo
    from multimodal_drl_rmc_tpu.runtime.train import add_common_args, build_config

    def parse(argv):
        p = argparse.ArgumentParser()
        add_common_args(p, HyperParams())
        return build_config(p.parse_args(argv))

    cfg = parse(["-algo", "C51DuelingDQNAgent", "-n_atoms", "31",
                 "-v_min", "-20", "-v_max", "40"])
    spec, _ = spec_for_algo(cfg)
    assert (spec.n_atoms, spec.v_min, spec.v_max) == (31, -20.0, 40.0)
    assert spec.dist_kind == "c51"

    cfg = parse(["-algo", "QrDuelingDQNAgent", "-n_atoms", "32"])
    spec, _ = spec_for_algo(cfg)
    assert spec.n_atoms == 32 and spec.dist_kind == "qr"

    # Scalar algo: distributional overrides don't leak into the head.
    cfg = parse(["-algo", "PerDuelingDoubleDQNAgent", "-n_atoms", "31"])
    spec, _ = spec_for_algo(cfg)
    assert spec.n_atoms == 1


def test_policy_runner_guard(tmp_path):
    """Safety envelope (guard_occ/guard_cap; BENCHMARKS "safety
    envelope"): while the previous cycle's merge occupancy exceeds the
    trigger, actions are capped at guard_cap; below it the policy acts
    unmodified; guard off (0.0) never caps."""
    cfg = tiny_cfg(tmp_path)
    learner = make_learner(cfg)
    import jax

    state = learner.init_state(jax.random.PRNGKey(0))
    pack = checkpoint.export_pack(cfg, state)
    runner = PolicyRunner(pack, backend="fake", cfg=cfg,
                          guard_occ=17.0, guard_cap=3)
    obs, _ = runner.env.reset(seed=3)
    runner._greedy = lambda params, o: np.asarray([7])  # force permissive
    runner._last_occ = 30.0
    assert runner.action(obs) == 3       # guard binds
    runner._last_occ = 10.0
    assert runner.action(obs) == 7       # healthy cycle untouched
    runner.guard_occ = 0.0
    runner._last_occ = 30.0
    assert runner.action(obs) == 7       # guard off
    runner.close()

    # End-to-end: a guarded episode runs and the guard state resets.
    runner2 = PolicyRunner(pack, backend="fake", cfg=cfg,
                           guard_occ=17.0, guard_cap=3)
    runner2._last_occ = 99.0
    info = runner2.run_episode(seed=3)
    assert info["l"] == 5
    runner2.close()
