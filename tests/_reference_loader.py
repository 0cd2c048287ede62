"""Import the actual reference solver from /root/reference for anchoring.

The reference's ``st.py`` (the pure-Python ``solve_st_fast_v2``,
st.py:361-452 — the readable twin of the Cython production kernel
st_cy.pyx:315-399) is importable once its runtime-only dependencies are
stubbed: ``control``/``traci`` (only used inside controller entry points we
never call), ``cvxopt`` (only used by ``finer_fit``), and ``st_cy`` (skipped
by forcing ``Settings.USE_CYTHON = False`` before import).

This gives the differential-test tower a root anchored in the *reference's
own code* rather than in re-implementations written alongside the kernels
under test.
"""

from __future__ import annotations

import sys
import types

_REFERENCE_DIR = "/root/reference"


def load_reference_st(cfg=None):
    """Import and return (reference_st_module, reference_Settings).

    When ``cfg`` (our Settings) is given, the reference Settings class
    attributes used by the solver cost/feasibility functions are set to
    match it.
    """
    if "st" not in sys.modules:
        # stub the runtime-only imports
        control_stub = types.ModuleType("control")
        sys.modules.setdefault("control", control_stub)
        cvxopt_stub = types.ModuleType("cvxopt")
        solvers_stub = types.SimpleNamespace(options={}, qp=None)
        cvxopt_stub.solvers = solvers_stub
        cvxopt_stub.matrix = None
        sys.modules.setdefault("cvxopt", cvxopt_stub)

        sys.path.insert(0, _REFERENCE_DIR)
        try:
            import config as ref_config  # reference config.py
            ref_config.Settings.USE_CYTHON = False  # skip the st_cy import
            import st as ref_st  # noqa: F401
        finally:
            sys.path.remove(_REFERENCE_DIR)

    ref_st = sys.modules["st"]
    ref_settings = sys.modules["config"].Settings
    if cfg is not None:
        apply_settings(ref_settings, cfg)
    return ref_st, ref_settings


def apply_settings(ref_settings, cfg) -> None:
    """Copy the solver-relevant fields of our frozen config onto the
    reference's mutable Settings class (the fields read by st.py's
    cost/feasibility helpers, st.py:105-144)."""
    for name in ("V_WEIGHT", "A_WEIGHT", "J_WEIGHT", "D_WEIGHT",
                 "DESIRED_SPEED", "MAX_SPEED",
                 "MAX_NEGATIVE_ACCELERATION", "MAX_POSITIVE_ACCELERATION",
                 "MINIMUM_NEGATIVE_JERK", "MAXIMUM_POSITIVE_JERK",
                 "MIN_ALLOWED_DISTANCE", "CRASH_MIN_S", "CAR_LENGTH",
                 "TICK_LENGTH", "T_DISCRETIZATION", "S_DISCRETIZATION",
                 "FUTURE_S", "FUTURE_T", "START_UNCERTAINTY",
                 "UNCERTAINTY_PER_SECOND", "MAX_PREDICTED_DECELERATION",
                 "COMBINATION_MIN_DISTANCE"):
        setattr(ref_settings, name, getattr(cfg, name))
