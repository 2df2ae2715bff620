"""Second-by-second device-vs-native sim trace under a static-green policy.

Round 4's protocol-divergence finding (BENCHMARKS "Large-N device-protocol
tail certification") is macroscopic: the JAX device sim and the native C++
twin place the main=6000 stability edge on opposite sides of green-30,
although both read their physics constants from the single definition site
(sim/physics.py). Both sims are DETERMINISTIC given the demand draw (RNG
only colors vehicles as connected, which never feeds back into dynamics),
so a fixed-demand episode gives one trajectory per simulator and the
divergence can be localized in time and mechanism.

This tool rolls ONE episode on each simulator with identical fixed demand
and a constant green, and records per second:
  zone   — vehicle count in the merge conflict window (drives breakdown)
  bkd    — the hysteretic breakdown level [0, 1]
and per cycle the cumulative arrived / delay. It prints a side-by-side
per-cycle table and the first second where the zone counts part ways.

Mechanism bisection flags (device side only):
  --exact-merge   replace the binned suffix-scan cross-leader search with
                  an exact O(N^2) search (the C++ twin's semantics) — if
                  the divergence survives, the 4 m bin quantization is not
                  the cause.
  --f64           run the device sim in float64 (global jax x64; the sim's
                  f32 literals are upcast on entry each step) — if the
                  divergence survives, f32 arithmetic is not the cause.

CPU-only by design (never contends with a TPU queue). Usage:
  JAX_PLATFORMS='' python scripts/diag_sim_trace.py --main 6000 --green 30
"""

from __future__ import annotations

import argparse
import csv
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("MDRLRMC_PALLAS", "0")  # XLA path (CPU)


def device_trace(main, ramp, off, pen, green, cycles, exact_merge, f64,
                 noise=0.0, seed=0):
    import jax

    jax.config.update("jax_platforms", "cpu")
    if f64:
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np

    from multimodal_drl_rmc_tpu.config import ScenarioConfig
    from multimodal_drl_rmc_tpu.sim import core
    from multimodal_drl_rmc_tpu.sim.core import GREEN, RED, zone_count

    if exact_merge:
        # C++-equivalent exact nearest-ahead cross-leader search; same
        # (sufp, sufs) plumbing so _substep runs unmodified.
        def _bin_stream_exact(pos_common, speed, valid):
            in_zone = valid & (pos_common >= core._MERGE_LO_COMMON)
            return jnp.where(in_zone, pos_common, jnp.inf), speed

        def _cross_lookup_exact(pos_common, valid, sufp, sufs):
            cand = jnp.where(sufp[None, :] > pos_common[:, None],
                             sufp[None, :], jnp.inf)
            lead_p = jnp.min(cand, axis=1)
            lead_s = sufs[jnp.argmin(cand, axis=1)]
            in_zone = valid & (pos_common >= core._MERGE_LO_COMMON)
            gap = jnp.where(in_zone, lead_p - pos_common - core.VEH_LENGTH_M,
                            jnp.inf)
            return gap, jnp.where(jnp.isfinite(gap), lead_s, 0.0)

        core._bin_stream = _bin_stream_exact
        core._cross_lookup = _cross_lookup_exact

    scen = ScenarioConfig(
        veh_per_hour_main=(main,), veh_per_hour_main_weights=(1.0,),
        veh_per_hour_on_ramp=(ramp,), veh_per_hour_on_ramp_weights=(1.0,),
        veh_per_hour_off_ramp=(off,), veh_per_hour_off_ramp_weights=(1.0,),
        con_penetration_rate_range=(pen, pen),
        accel_noise_sigma=noise)
    state = core.reset(jax.random.PRNGKey(seed), scen)

    sched = jnp.asarray(
        [GREEN if s < green else RED for s in range(40)], jnp.int32)

    @jax.jit
    def one_cycle(state):
        def body(s, ph):
            s = core.step_1s(s._replace(phase=ph), noise)
            return s, (zone_count(s), s.breakdown)

        state, (z, b) = jax.lax.scan(body, state, sched)
        return state, z, b

    zs, bs, arr, loss = [], [], [], []
    for _ in range(cycles):
        state, z, b = one_cycle(state)
        zs.append(np.asarray(z))
        bs.append(np.asarray(b))
        arr.append(float(state.arrived.sum()))
        loss.append(float(state.loss_sum.sum()))
    print("device final per-chain counts:",
          np.asarray(state.count).tolist(),
          "pending:", np.asarray(state.pending).round(1).tolist())
    return (np.concatenate(zs), np.concatenate(bs),
            np.asarray(arr), np.asarray(loss))


def native_trace(main, ramp, off, pen, green, cycles, noise=0.0,
                 seed=0):
    import ctypes

    import numpy as np

    from multimodal_drl_rmc_tpu.config import ScenarioConfig
    from multimodal_drl_rmc_tpu.envs.backends.native import NativeSimBackend

    scen = ScenarioConfig(
        veh_per_hour_main=(main,), veh_per_hour_main_weights=(1.0,),
        veh_per_hour_on_ramp=(ramp,), veh_per_hour_on_ramp_weights=(1.0,),
        veh_per_hour_off_ramp=(off,), veh_per_hour_off_ramp_weights=(1.0,),
        con_penetration_rate_range=(pen, pen),
        accel_noise_sigma=noise)
    be = NativeSimBackend(scen)
    be.reset(seed=seed)
    # 5 s red warm-up: device reset() bakes this in; on the host it is the
    # controller's job (rl_controller.py:165-173), so replicate here.
    be.set_phase(1)
    for _ in range(5):
        be.step()

    zs, bs, arr, loss = [], [], [], []
    for _ in range(cycles):
        for s in range(40):
            be.set_phase(0 if s < green else 1)
            be.step()
            zs.append(be.zone_count())
            bs.append(be.breakdown())
        out = np.zeros(8, np.float64)
        be._lib.ts_trip_stats(
            be._handle, out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
        arr.append(out[0])
        loss.append(out[2])
    print("native final per-chain counts:",
          [be._lib.ts_chain_count(be._handle, c, -1.0, 1e18)
           for c in range(5)])
    return (np.asarray(zs, float), np.asarray(bs),
            np.asarray(arr, float), np.asarray(loss))


def findiff(main, ramp, off, pen, green, seconds, eps):
    """Step both sims 1 s at a time and report the first per-vehicle
    position difference exceeding ``eps`` — a SEMANTIC divergence shows as
    a large first diff at one vehicle; f32-vs-f64 noise as ~1e-4."""
    import ctypes

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from multimodal_drl_rmc_tpu.config import ScenarioConfig
    from multimodal_drl_rmc_tpu.envs.backends.native import NativeSimBackend
    from multimodal_drl_rmc_tpu.sim import core
    from multimodal_drl_rmc_tpu.sim.core import GREEN, RED

    scen = ScenarioConfig(
        veh_per_hour_main=(main,), veh_per_hour_main_weights=(1.0,),
        veh_per_hour_on_ramp=(ramp,), veh_per_hour_on_ramp_weights=(1.0,),
        veh_per_hour_off_ramp=(off,), veh_per_hour_off_ramp_weights=(1.0,),
        con_penetration_rate_range=(pen, pen))
    state = core.reset(jax.random.PRNGKey(0), scen)
    be = NativeSimBackend(scen)
    be.reset(seed=0)
    be.set_phase(1)
    for _ in range(5):
        be.step()

    step = jax.jit(lambda s, ph: core.step_1s(s._replace(phase=ph)))
    cap = 4096
    npos = np.zeros(cap, np.float64)
    nspd = np.zeros(cap, np.float64)
    nchn = np.zeros(cap, np.int32)
    ncon = np.zeros(cap, np.uint8)

    def native_sorted():
        n = be._lib.ts_snapshot(
            be._handle,
            npos.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            nspd.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            nchn.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            ncon.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap)
        out = {}
        for c in range(5):
            m = nchn[:n] == c
            out[c] = np.sort(npos[:n][m])[::-1]
        return out

    for t in range(seconds):
        ph = GREEN if (t % 40) < green else RED
        state = step(state, jnp.asarray(ph, jnp.int32))
        be.set_phase(0 if ph == GREEN else 1)
        be.step()
        dpos = np.asarray(state.pos)
        dact = np.asarray(state.active)
        nat = native_sorted()
        for c in range(5):
            dv = np.sort(dpos[c][dact[c]])[::-1]
            nv = nat[c]
            if len(dv) != len(nv):
                print(f"t={t + 5}s chain {c}: COUNT diff "
                      f"device {len(dv)} native {len(nv)}")
                print(f"  device head: {dv[:6].round(2)}")
                print(f"  native head: {nv[:6].round(2)}")
                return
            if len(dv) and np.abs(dv - nv).max() > eps:
                i = int(np.abs(dv - nv).argmax())
                print(f"t={t + 5}s chain {c} veh#{i} (front-sorted): "
                      f"device {dv[i]:.4f} native {nv[i]:.4f} "
                      f"(diff {dv[i] - nv[i]:+.4f})")
                lo = max(0, i - 2)
                print(f"  device pos[{lo}:{i + 3}]: {dv[lo:i + 3].round(3)}")
                print(f"  native pos[{lo}:{i + 3}]: {nv[lo:i + 3].round(3)}")
                return
    print(f"no per-vehicle divergence > {eps} m within {seconds}s")


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--main", type=int, default=6000)
    ap.add_argument("--ramp", type=int, default=1400)
    ap.add_argument("--off", type=int, default=100)
    ap.add_argument("--pen", type=float, default=0.5)
    ap.add_argument("--green", type=float, default=30.0)
    ap.add_argument("--cycles", type=int, default=90)
    ap.add_argument("--exact-merge", action="store_true")
    ap.add_argument("--f64", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--noise", type=float, default=0.0,
                    help="accel_noise_sigma for BOTH sims (statistical, "
                         "not trajectory, comparison when > 0)")
    ap.add_argument("--findiff", action="store_true",
                    help="report the first per-vehicle divergence instead "
                         "of the cycle table")
    ap.add_argument("--eps", type=float, default=0.05)
    ap.add_argument("--csv", default=None)
    args = ap.parse_args(argv)

    if args.findiff:
        findiff(args.main, args.ramp, args.off, args.pen, args.green,
                args.cycles * 40, args.eps)
        return

    import numpy as np

    nz, nb, narr, nloss = native_trace(
        args.main, args.ramp, args.off, args.pen, args.green, args.cycles,
        args.noise, args.seed)
    dz, db, darr, dloss = device_trace(
        args.main, args.ramp, args.off, args.pen, args.green, args.cycles,
        args.exact_merge, args.f64, args.noise, args.seed)

    tag = ("device" + ("+exact" if args.exact_merge else "")
           + ("+f64" if args.f64 else ""))
    print(f"\nmain={args.main} ramp={args.ramp} off={args.off} "
          f"pen={args.pen} green={args.green:.0f}  [{tag} vs native]")
    print(f"{'cyc':>3} | {'zone dev':>8} {'zone nat':>8} | "
          f"{'bkd dev':>7} {'bkd nat':>7} | {'delay dev':>9} {'delay nat':>9}")
    for c in range(args.cycles):
        sl = slice(c * 40, (c + 1) * 40)
        ddel = dloss[c] / max(darr[c], 1.0)
        ndel = nloss[c] / max(narr[c], 1.0)
        if c % 5 == 4 or c < 3:
            print(f"{c + 1:>3} | {dz[sl].mean():8.1f} {nz[sl].mean():8.1f} | "
                  f"{db[sl].max():7.2f} {nb[sl].max():7.2f} | "
                  f"{ddel:9.2f} {ndel:9.2f}")

    diff = np.abs(dz - nz)
    first = int(np.argmax(diff >= 3)) if (diff >= 3).any() else -1
    print(f"\nfirst second with |zone diff| >= 3: "
          f"{first if first >= 0 else 'never'}"
          f"{f' (cycle {first // 40 + 1})' if first >= 0 else ''}")
    dd, nd = dloss[-1] / max(darr[-1], 1), nloss[-1] / max(narr[-1], 1)
    print(f"episode delay: device {dd:.2f}  native {nd:.2f}  "
          f"(bkd device max {db.max():.2f}, native max {nb.max():.2f})")

    if args.csv:
        with open(args.csv, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["second", "zone_device", "zone_native",
                        "bkd_device", "bkd_native"])
            for s in range(len(dz)):
                w.writerow([s, dz[s], nz[s], db[s], nb[s]])
        print(f"trace -> {args.csv}")


if __name__ == "__main__":
    main()
