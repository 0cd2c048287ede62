"""ctypes bindings to the native C++ heap-Dijkstra oracle (csrc/).

The oracle is the host-side golden reference for the dense-DP device solver:
differential tests run both on the same grids and demand (near-)exact
agreement.  It doubles as a fast CPU fallback for single-scenario use.

The shared library is built on demand with g++ (csrc/build.sh); no Python
build-system dependency is required.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_CSRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "csrc")
_LIB_PATH = os.path.join(_CSRC, "build", "libst_oracle.so")

_lib: Optional[ctypes.CDLL] = None


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        subprocess.run(["sh", os.path.join(_CSRC, "build.sh")], check=True,
                       capture_output=True)
    lib = ctypes.CDLL(_LIB_PATH)
    dp = ctypes.POINTER(ctypes.c_double)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.st_oracle_solve_fast.restype = None
    lib.st_oracle_solve_fast.argtypes = (
        [u8p, dp, ctypes.c_int, dp, ctypes.c_int, ctypes.c_double,
         ctypes.c_double, dp] + [ctypes.c_double] * 11 + [dp])
    lib.st_oracle_solve_no_jerk_fast.restype = None
    lib.st_oracle_solve_no_jerk_fast.argtypes = (
        [u8p, dp, ctypes.c_int, dp, ctypes.c_int, ctypes.c_double, dp]
        + [ctypes.c_double] * 8 + [dp])
    _lib = lib
    return lib


def _as_c(arr, dtype):
    return np.ascontiguousarray(np.asarray(arr), dtype=dtype)


def solve_fast(obstacles, s_values, t_values, ego_speed, ego_accel,
               distances, d_weight, v_weight, a_weight, j_weight,
               desired_speed, max_speed, neg_accel, pos_accel, neg_jerk,
               pos_jerk, min_allowed_distance) -> np.ndarray:
    """Jerk-limited heap solve (semantics of st_cy.pyx:315-399)."""
    lib = _load()
    obst = _as_c(obstacles, np.uint8)
    s = _as_c(s_values, np.float64)
    t = _as_c(t_values, np.float64)
    dist = _as_c(distances, np.float64)
    out = np.zeros(t.size, np.float64)
    lib.st_oracle_solve_fast(
        obst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        s.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), s.size,
        t.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), t.size,
        float(ego_speed), float(ego_accel),
        dist.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        float(d_weight), float(v_weight), float(a_weight), float(j_weight),
        float(desired_speed), float(max_speed), float(neg_accel),
        float(pos_accel), float(neg_jerk), float(pos_jerk),
        float(min_allowed_distance),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return out


def solve_no_jerk_fast(obstacles, s_values, t_values, ego_speed, distances,
                       d_weight, v_weight, a_weight, desired_speed,
                       max_speed, neg_accel, pos_accel,
                       min_allowed_distance) -> np.ndarray:
    """No-jerk heap solve (semantics of st_cy.pyx:209-312, but honoring
    runtime weights rather than baked-in module constants)."""
    lib = _load()
    obst = _as_c(obstacles, np.uint8)
    s = _as_c(s_values, np.float64)
    t = _as_c(t_values, np.float64)
    dist = _as_c(distances, np.float64)
    out = np.zeros(t.size, np.float64)
    lib.st_oracle_solve_no_jerk_fast(
        obst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        s.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), s.size,
        t.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), t.size,
        float(ego_speed),
        dist.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        float(d_weight), float(v_weight), float(a_weight),
        float(desired_speed), float(max_speed), float(neg_accel),
        float(pos_accel), float(min_allowed_distance),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return out
