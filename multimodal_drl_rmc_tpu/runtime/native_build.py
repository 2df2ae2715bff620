"""Build/load helper for the native C++ microsim (csrc/trafficsim.cc).

No pip/pybind involved: the shared library is compiled with the system g++
on first use (cached by source mtime) and loaded through ctypes. All entry
points release the GIL during calls, so a ThreadVecEnv of native backends
gets true multi-core parallelism.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_SRC = os.path.join(os.path.dirname(__file__), "csrc", "trafficsim.cc")
_HDR = os.path.join(os.path.dirname(__file__), "csrc", "physics_constants.h")
_LIB = os.path.join(os.path.dirname(__file__), "csrc", "libtrafficsim.so")
_lock = threading.Lock()
_lib = None


def _sync_physics_header() -> bool:
    """(Re)generate physics_constants.h from sim/physics.py.

    Returns True when the header content changed — the one-definition-site
    guarantee: a Python-side constant edit forces a native rebuild."""
    from ..sim.physics import cpp_header

    want = cpp_header()
    have = None
    if os.path.isfile(_HDR):
        with open(_HDR) as f:
            have = f.read()
    if have != want:
        with open(_HDR, "w") as f:
            f.write(want)
        return True
    return False


def build(force: bool = False) -> str:
    """Compile the shared library if missing or stale; returns its path."""
    changed = _sync_physics_header()
    if (not force and not changed and os.path.isfile(_LIB)
            and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC)):
        return _LIB
    # Compile to a temp path and rename: overwriting the .so in place
    # (g++ -o truncates) would corrupt the mapping of any process that
    # already dlopen'd it (e.g. a running eval while constants change).
    tmp = _LIB + ".tmp"
    cmd = ["g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
           "-o", tmp, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    except subprocess.CalledProcessError as e:  # pragma: no cover
        raise RuntimeError(f"native sim build failed:\n{e.stderr}") from e
    os.replace(tmp, _LIB)
    return _LIB


def load() -> ctypes.CDLL:
    """Build if needed and return the loaded library (process singleton)."""
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        lib = ctypes.CDLL(build())
        c = ctypes
        dp = c.POINTER(c.c_double)
        ip = c.POINTER(c.c_int)
        u8p = c.POINTER(c.c_uint8)
        lib.ts_create.restype = c.c_void_p
        lib.ts_create.argtypes = [
            c.c_int, dp, ip, dp, dp, dp, c.c_double, c.c_double,
            c.c_int, ip, dp, c.c_double, c.c_double, dp, c.c_uint64,
        ]
        lib.ts_destroy.argtypes = [c.c_void_p]
        lib.ts_reset.argtypes = [c.c_void_p, c.c_double, c.c_double,
                                 c.c_double, c.c_double, c.c_uint64]
        lib.ts_step.argtypes = [c.c_void_p, c.c_int, c.c_int]
        lib.ts_set_phase.argtypes = [c.c_void_p, c.c_int]
        lib.ts_get_phase.argtypes = [c.c_void_p]
        lib.ts_get_phase.restype = c.c_int
        lib.ts_time.argtypes = [c.c_void_p]
        lib.ts_time.restype = c.c_double
        lib.ts_breakdown.argtypes = [c.c_void_p]
        lib.ts_breakdown.restype = c.c_double
        lib.ts_zone_count.argtypes = [c.c_void_p]
        lib.ts_zone_count.restype = c.c_int
        lib.ts_set_accel_noise.argtypes = [c.c_void_p, c.c_double]
        lib.ts_interval_count.argtypes = [c.c_void_p, c.c_int]
        lib.ts_interval_count.restype = c.c_int
        lib.ts_interval_occ.argtypes = [c.c_void_p, c.c_int]
        lib.ts_interval_occ.restype = c.c_double
        lib.ts_step_count.argtypes = [c.c_void_p, c.c_int]
        lib.ts_step_count.restype = c.c_int
        lib.ts_step_speed.argtypes = [c.c_void_p, c.c_int]
        lib.ts_step_speed.restype = c.c_double
        lib.ts_chain_count.argtypes = [c.c_void_p, c.c_int, c.c_double, c.c_double]
        lib.ts_chain_count.restype = c.c_int
        lib.ts_snapshot.argtypes = [c.c_void_p, dp, dp, ip, u8p, c.c_int]
        lib.ts_snapshot.restype = c.c_int
        lib.ts_trip_stats.argtypes = [c.c_void_p, dp]
        lib.ts_trip_stats_full.argtypes = [c.c_void_p, dp]
        _lib = lib
        return lib
