"""Run the native C++ twin with float32 arithmetic (one-off bisection).

The device (JAX, f32) and native (C++, f64) sims share every physics
constant and semantic (scripts/diag_sim_trace.py: saturated and
green-25/35/40 trajectories match), yet at the bistable green-30 /
main-6000 cell the device sim jams for every ramp demand >= 1100 while
the native sim stays free to >= 1900. This script isolates PRECISION as
the candidate mechanism: it compiles the same trafficsim.cc with
``double`` rewritten to ``float`` and rolls the same static-green
episode. If the f32 twin jams like the device sim, the basin boundary
offset is a property of f32 arithmetic at this bifurcation, not of
either implementation.

Usage: python scripts/diag_native_f32.py --main 6000 --ramp 1400 --green 30
"""

from __future__ import annotations

import argparse
import ctypes
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CSRC = os.path.join(REPO, "multimodal_drl_rmc_tpu/runtime/csrc")


def build_f32() -> str:
    src = os.path.join("/tmp", "trafficsim_f32.cc")
    lib = os.path.join("/tmp", "libtrafficsim_f32.so")
    with open(os.path.join(CSRC, "trafficsim.cc")) as f:
        code = f.read()
    # The header keeps double constexprs so mixed float*double arithmetic
    # would silently promote; rewrite both to float.
    with open(os.path.join(CSRC, "physics_constants.h")) as f:
        hdr = f.read().replace("constexpr double", "constexpr float")
    code = code.replace('#include "physics_constants.h"', hdr)
    code = code.replace("double", "float")
    # Suffix floating literals so std::max/clamp(float, literal) resolve.
    import re

    code = re.sub(r"(\d+\.\d+(?:[eE][+-]?\d+)?|\d+[eE][+-]?\d+)(?![\w.])",
                  r"\1f", code)
    with open(src, "w") as f:
        f.write(code)
    subprocess.run(["g++", "-O3", "-march=native", "-std=c++17", "-shared",
                    "-fPIC", "-o", lib, src], check=True,
                   capture_output=True, text=True)
    return lib


def run(lib_path, main, ramp, off, pen, green, cycles, f32, noise=0.0,
        seed=0):
    from multimodal_drl_rmc_tpu.sim.geometry import GEO

    real = ctypes.c_float if f32 else ctypes.c_double
    lib = ctypes.CDLL(lib_path)
    rp = ctypes.POINTER(real)
    ip = ctypes.POINTER(ctypes.c_int)
    lib.ts_create.restype = ctypes.c_void_p
    lib.ts_create.argtypes = [ctypes.c_int, rp, ip, rp, rp, rp, real, real,
                              ctypes.c_int, ip, rp, real, real, rp,
                              ctypes.c_uint64]
    lib.ts_reset.argtypes = [ctypes.c_void_p, real, real, real, real,
                             ctypes.c_uint64]
    lib.ts_step.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_int]
    lib.ts_trip_stats.argtypes = [ctypes.c_void_p, rp]
    lib.ts_zone_count.argtypes = [ctypes.c_void_p]
    lib.ts_zone_count.restype = ctypes.c_int
    lib.ts_set_accel_noise.argtypes = [ctypes.c_void_p, real]

    dt = np.float32 if f32 else np.float64

    def arr(a, t=dt):
        return np.ascontiguousarray(a, t)

    seg_end = np.where(np.isfinite(GEO.seg_end), GEO.seg_end, 1e18)
    n_segs = np.sum(np.isfinite(GEO.seg_end), axis=1).astype(np.int32)
    stop = np.where(np.isfinite(GEO.stop_line), GEO.stop_line, 1e18)
    keep = [arr(GEO.chain_length), arr(n_segs, np.int32), arr(seg_end),
            arr(GEO.seg_speed), arr(stop), arr(GEO.loop_chain, np.int32),
            arr(GEO.loop_pos), arr(GEO.freeflow_tt)]

    def p(a):
        return a.ctypes.data_as(rp if a.dtype != np.int32 else ip)

    h = lib.ts_create(len(GEO.chain_length), p(keep[0]), p(keep[1]),
                      p(keep[2]), p(keep[3]), p(keep[4]),
                      real(GEO.merge_offset), real(GEO.merge_zone_lo),
                      len(GEO.loop_names), p(keep[5]), p(keep[6]),
                      real(GEO.ramp_edge_end), real(40.0), p(keep[7]), 0)
    lib.ts_set_accel_noise(h, real(noise))
    lib.ts_reset(h, real(main), real(ramp), real(off), real(pen), seed)
    for _ in range(5):
        lib.ts_step(h, 1, 1)
    zmax = 0
    for t in range(cycles * 40):
        lib.ts_step(h, 0 if (t % 40) < green else 1, 1)
        zmax = max(zmax, lib.ts_zone_count(h))
    out = np.zeros(8, dt)
    lib.ts_trip_stats(h, out.ctypes.data_as(rp))
    return out[2] / max(out[0], 1.0), zmax


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--main", type=float, default=6000)
    ap.add_argument("--ramp", type=float, default=1400)
    ap.add_argument("--off", type=float, default=100)
    ap.add_argument("--pen", type=float, default=0.5)
    ap.add_argument("--green", type=float, default=30.0)
    ap.add_argument("--cycles", type=int, default=30)
    ap.add_argument("--noise", type=float, default=0.0,
                    help="driver accel noise sigma (m/s^2) for both builds")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    from multimodal_drl_rmc_tpu.runtime.native_build import build

    d64, z64 = run(build(), args.main, args.ramp, args.off, args.pen,
                   args.green, args.cycles, f32=False, noise=args.noise, seed=args.seed)
    d32, z32 = run(build_f32(), args.main, args.ramp, args.off, args.pen,
                   args.green, args.cycles, f32=True, noise=args.noise, seed=args.seed)
    print(f"main={args.main:.0f} ramp={args.ramp:.0f} green={args.green:.0f}"
          f" cycles={args.cycles} noise={args.noise} seed={args.seed}")
    print(f"  C++ f64: delay {d64:7.2f}  zone max {z64}")
    print(f"  C++ f32: delay {d32:7.2f}  zone max {z32}")


if __name__ == "__main__":
    main()
