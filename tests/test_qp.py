"""QP smoother vs a scipy oracle on randomized coarse paths.

The acceptance criterion mirrors BASELINE.md: the *executed first step*
(x[1] - x[0]) must agree with a converged constrained-QP solution well
within 1e-3 (the reference's cvxopt IPM at maxiters=10 is essentially
converged for this problem size).
"""

import functools

import jax
import numpy as np
import pytest
from scipy.optimize import minimize

from rl_mpc_lanemerging_tpu.config import Settings
from rl_mpc_lanemerging_tpu.ops import qp

CFG = Settings()
DT = CFG.TICK_LENGTH
CDT = CFG.T_DISCRETIZATION
N = CFG.fine_horizon


def _difference_operator(n):
    """Unscaled constraint operator + runtime bounds builder (independent
    transcription of the constraint assembly in reference st.py:608-719)."""
    dt2, dt3 = DT * DT, DT ** 3
    rows, lows, highs = [], [], []

    def add(row, lo, hi):
        rows.append(row), lows.append(lo), highs.append(hi)

    for i in range(n - 1):
        r = np.zeros(n)
        r[i], r[i + 1] = -1 / DT, 1 / DT
        add(r, 0.0, CFG.MAX_SPEED)
    return rows, lows, highs


def scipy_reference(coarse, v0, a0):
    """Converged solve of the same QP via trust-constr (test oracle only)."""
    from scipy.optimize import LinearConstraint
    t = np.arange(len(coarse)) * CDT
    tf = np.arange(N) * DT
    b = np.interp(tf, t, coarse)
    dt2, dt3 = DT * DT, DT ** 3

    rows, lows, highs = _difference_operator(N)
    for i in range(N - 1):
        r = np.zeros(N)
        if i == 0:
            r[0], r[1] = -1 / dt2, 1 / dt2
            off = v0 / DT
        else:
            r[i - 1], r[i], r[i + 1] = 1 / dt2, -2 / dt2, 1 / dt2
            off = 0.0
        rows.append(r)
        lows.append(CFG.MAX_NEGATIVE_ACCELERATION + off)
        highs.append(CFG.MAX_POSITIVE_ACCELERATION + off)
    for i in range(N - 1):
        r = np.zeros(N)
        if i == 0:
            r[0], r[1] = -1 / dt3, 1 / dt3
            off = a0 / DT + v0 / dt2
        elif i == 1:
            r[0], r[1], r[2] = 2 / dt3, -3 / dt3, 1 / dt3
            off = -v0 / dt2
        else:
            r[i - 2], r[i - 1], r[i], r[i + 1] = \
                -1 / dt3, 3 / dt3, -3 / dt3, 1 / dt3
            off = 0.0
        rows.append(r)
        lows.append(CFG.MINIMUM_NEGATIVE_JERK + off)
        highs.append(CFG.MAXIMUM_POSITIVE_JERK + off)
    r = np.zeros(N)
    r[0] = 1.0
    rows.append(r)
    lows.append(coarse[0])
    highs.append(coarse[0])

    lc = LinearConstraint(np.stack(rows), np.array(lows), np.array(highs))
    res = minimize(lambda x: np.sum((x - b) ** 2), b,
                   jac=lambda x: 2 * (x - b), constraints=[lc],
                   method="trust-constr",
                   options={"maxiter": 500, "gtol": 1e-10, "xtol": 1e-12})
    return res.x


def feasible_coarse_path(rng, v0, a0, num_t=18):
    """A kinematically plausible coarse path: integrate bounded jerk."""
    s, v, a = 0.0, v0, a0
    out = [s]
    for _ in range(num_t - 1):
        j = rng.uniform(-4.0, 4.0)
        a = np.clip(a + j * CDT, -6.0, 4.5)
        v = np.clip(v + a * CDT, 0.0, 30.0)
        s = s + v * CDT
        out.append(s)
    return np.array(out)


_fit = jax.jit(functools.partial(
    qp.finer_fit_qp,
    op=qp.build_operator(N, DT),
    coarse_delta_t=CDT, max_speed=CFG.MAX_SPEED,
    pos_accel=CFG.MAX_POSITIVE_ACCELERATION,
    neg_accel=CFG.MAX_NEGATIVE_ACCELERATION,
    pos_jerk=CFG.MAXIMUM_POSITIVE_JERK,
    neg_jerk=CFG.MINIMUM_NEGATIVE_JERK,
    iterations=CFG.QP_ITERATIONS))


@pytest.mark.parametrize("seed", range(5))
def test_first_step_matches_converged_qp(seed):
    rng = np.random.default_rng(seed)
    v0 = float(rng.uniform(0, 25))
    a0 = float(rng.uniform(-4, 4))
    coarse = feasible_coarse_path(rng, v0, a0)
    x, fine_len = _fit(coarse, np.int32(len(coarse)), v0, a0)
    x = np.asarray(x)
    assert int(fine_len) == N
    ref = scipy_reference(coarse, v0, a0)
    # executed control = first-step displacement
    assert abs((x[1] - x[0]) - (ref[1] - ref[0])) < 2e-4
    # full-path agreement at a looser tolerance
    np.testing.assert_allclose(x, ref, atol=5e-3)


def test_trimmed_path_masks_constraints():
    rng = np.random.default_rng(7)
    coarse = feasible_coarse_path(rng, 10.0, 0.0)
    coarse[6:] = 0.0  # trimmed: only 6 valid coarse points
    x, fine_len = _fit(coarse, np.int32(6), 10.0, 0.0)
    # (6-1)*0.3 = 1.5s horizon -> round(1.5/0.2 + 1) = 8 fine points
    assert int(fine_len) == 8
    x = np.asarray(x)
    v = np.diff(x)[: int(fine_len) - 1] / DT
    assert np.all(v >= -1e-6) and np.all(v <= CFG.MAX_SPEED + 1e-6)
    assert abs(x[0] - coarse[0]) < 1e-6


def test_smooth_path_is_near_identity():
    # a path already satisfying all constraints should pass through nearly
    # unchanged (the QP projects onto the feasible set)
    v0 = 15.0
    coarse = np.arange(18) * CDT * v0
    x, _ = _fit(coarse, np.int32(18), v0, 0.0)
    fine = np.arange(N) * DT * v0
    np.testing.assert_allclose(np.asarray(x), fine, atol=1e-4)
