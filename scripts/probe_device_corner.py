"""Device-sim corner probe: constant-green vs pack policies at a forced
demand cell.

Round-4 finding: the device and host sims disagree at the main=6000
demand edge — host-protocol-validated ~29 agents collapse on 10-40% of
device episodes there (frozen-pen probes, BENCHMARKS "protocol
divergence"), while the host/native sim never collapses (0/125
episodes). This script separates the two candidate explanations:

* device PHYSICS: if the best static greens (20-30 s — the host sim's
  stable band, eval_static_greens.py) also collapse on the device sim
  at main=6000, the device corridor is fundamentally harsher there and
  ANY near-permissive policy breaks.
* POLICY fragility: if static greens stay bounded and only the learned
  packs collapse, the agents' trigger timing is calibrated to a
  stability edge the two sims place differently, and the device
  protocol is a harsher (not wrong) test of the same policy class.

Defaults to CPU (XLA fallback) so it can never contend with a training
queue on the one TPU; pass --tpu only when the chip is free. Usage:
  python scripts/probe_device_corner.py [-e 16] [--main 6000]
      [--pen 0.2] [--greens 20,25,30] [--packs p1.pack ...] [--tpu]
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("-e", type=int, default=16, help="episodes")
    ap.add_argument("--main", type=int, default=6000)
    ap.add_argument("--pen", type=float, default=0.2)
    ap.add_argument("--greens", default="20,25,30")
    ap.add_argument("--master-seed", type=int, default=42)
    ap.add_argument("--packs", nargs="*", default=[])
    ap.add_argument("--tpu", action="store_true",
                    help="allow the TPU (default: force CPU — the env-var "
                         "route does not stick under the axon sitecustomize)")
    args = ap.parse_args(argv)

    import jax

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from multimodal_drl_rmc_tpu.config import Config, EnvConfig, ScenarioConfig
    from multimodal_drl_rmc_tpu.sim.env import DeviceRampEnv
    from multimodal_drl_rmc_tpu.sim.eval_on_device import DeviceEvaluator

    scen = ScenarioConfig(
        veh_per_hour_main=(args.main,), veh_per_hour_main_weights=(1.0,),
        con_penetration_rate_range=(args.pen, args.pen))
    cfg = Config(env=EnvConfig(scenario=scen))
    cycles = int(scen.episode_seconds // cfg.env.cycle_seconds)
    greens = [float(g) for g in args.greens.split(",") if g]
    acts = list(cfg.env.green_time_actions_sec)

    # Pad E so the fused kernel tiles (same rule as DeviceEvaluator).
    E = args.e
    from multimodal_drl_rmc_tpu.sim.core import default_block
    while E % default_block():
        E += 1

    # One-cycle horizon headroom so auto-reset never fires (DeviceEvaluator
    # does the same).
    scen_h = ScenarioConfig(**{**scen.__dict__,
                               "episode_seconds":
                               (cycles + 1) * cfg.env.cycle_seconds})
    env = DeviceRampEnv(EnvConfig(**{**cfg.env.__dict__, "scenario": scen_h}), E)
    keys = jax.random.split(jax.random.PRNGKey(args.master_seed), E)

    @jax.jit
    def roll_const(action_idx):
        states = env._reset(keys)

        def body(states, _):
            states, _ = env.step(
                states, jnp.full((E,), action_idx, jnp.int32))
            return states, None

        states, _ = jax.lax.scan(body, states, None, length=cycles)
        return states.sim

    def report(label, sim):
        loss = np.asarray(sim.loss_sum)[:args.e].sum(axis=1)
        arr = np.asarray(sim.arrived)[:args.e].sum(axis=1)
        d = loss / np.maximum(arr, 1.0)
        bad = int((d > 60).sum())
        print(f"{label}: delay {d.mean():7.2f} worst {d.max():6.1f} "
              f"catastrophic {bad}/{args.e}")

    print(f"device sim, main={args.main} pen={args.pen} "
          f"E={args.e} (padded {E}) cycles={cycles}")
    for g in greens:
        idx = acts.index(g)
        report(f"static green {g:4.0f}s", roll_const(idx))

    if args.packs:
        ev = DeviceEvaluator(cfg, n_episodes=args.e,
                             master_seed=args.master_seed)
        for p in args.packs:
            rows = ev.evaluate([p])
            d = np.array([r["avg_time_loss"] for r in rows])
            bad = int((d > 60).sum())
            print(f"pack {os.path.basename(p)[:48]}: delay {d.mean():7.2f} "
                  f"worst {d.max():6.1f} catastrophic {bad}/{len(d)}")


if __name__ == "__main__":
    main()
