"""Corridor constraints + path-cost reporter (reference st.py:551-581,
672-705 corridor rows; st.py:291-336 get_path_cost violations)."""

import jax
import jax.numpy as jnp
import numpy as np

from rl_mpc_lanemerging_tpu.config import Settings
from rl_mpc_lanemerging_tpu.ops import qp, st_dp
from rl_mpc_lanemerging_tpu.planner import mpc
from rl_mpc_lanemerging_tpu.prediction import make_state

CFG = Settings().replace(MAX_SENSED_CARS=8, FUTURE_S=30.0,
                         QP_ITERATIONS=200)


def test_corridor_upper_bound_is_respected():
    """A slow car just ahead caps the smoothed path below its projection."""
    n = CFG.fine_horizon
    op = qp.build_operator(n, CFG.TICK_LENGTH)
    # coarse path that wants to accelerate through the corridor
    T = CFG.num_t
    coarse = jnp.asarray(np.cumsum(np.full(T, 3.0)), jnp.float64)
    t_fine = np.arange(n) * CFG.TICK_LENGTH
    lead_s0, lead_v = 12.0, 2.0     # starts ahead of the path start (3.0)
    pos_hi = jnp.asarray(lead_s0 + lead_v * t_fine - CFG.CAR_LENGTH)
    fine, fine_len = qp.finer_fit_qp(
        coarse, jnp.asarray(T), jnp.float64(10.0), jnp.float64(0.0),
        op, CFG.T_DISCRETIZATION, CFG.MAX_SPEED,
        CFG.MAX_POSITIVE_ACCELERATION, CFG.MAX_NEGATIVE_ACCELERATION,
        CFG.MAXIMUM_POSITIVE_JERK, CFG.MINIMUM_NEGATIVE_JERK,
        iterations=500, pos_hi=pos_hi)
    fine = np.asarray(fine)
    assert np.all(fine[1:] <= np.asarray(pos_hi)[1:] + 1e-2)


def test_corridor_from_state_selects_bracketing_cars():
    state = make_state(-45.0, -1.6, 8.0, 0.0,
                       [20.0, -20.0, -60.0], [5.0, 6.0, 7.0],
                       [0.0, 0.0, 0.0], num_slots=CFG.MAX_SENSED_CARS)
    # plan ends between car 0 (ahead) and car 1 (behind)
    lo, hi = mpc.corridor_from_state(state, jnp.float32(30.0), CFG)
    lo, hi = np.asarray(lo), np.asarray(hi)
    assert np.all(np.isfinite(hi))      # a car ends ahead -> upper bound
    assert np.all(hi > 0)
    assert np.all(lo < hi)


def test_path_cost_report_counts_violations():
    w = mpc.weights_from_settings(CFG)
    delta_t = CFG.T_DISCRETIZATION
    num_s = 801
    s_values = jnp.arange(num_s, dtype=jnp.float64) * CFG.S_DISCRETIZATION
    distances = jnp.full((CFG.num_t, num_s), 1e10, jnp.float64)
    # on-grid smooth path: constant 5 m/s (multiple of delta_s per step)
    step = round(5.0 * delta_t / CFG.S_DISCRETIZATION)
    seq = jnp.asarray([i * step * CFG.S_DISCRETIZATION
                       for i in range(CFG.num_t)], jnp.float64)
    total, rep = mpc.path_cost_report(
        seq, jnp.float64(5.0), jnp.float64(0.0), delta_t, distances,
        s_values, w)
    assert np.isfinite(float(total))
    assert int(rep["speed_violations"]) == 0
    assert int(rep["accel_violations"]) == 0
    assert int(rep["jerk_violations"]) == 0

    # a path that jumps a huge distance in one step violates everything
    bad = seq.at[5].add(40.0 * CFG.S_DISCRETIZATION * 200)
    _, rep_bad = mpc.path_cost_report(
        bad, jnp.float64(5.0), jnp.float64(0.0), delta_t, distances,
        s_values, w)
    assert int(rep_bad["speed_violations"]) >= 1
    assert int(rep_bad["accel_violations"]) >= 1
    assert int(rep_bad["jerk_violations"]) >= 1


def test_path_cost_matches_dp_edge_costs():
    """For an on-grid path the reporter total equals the sum of DP edge
    costs — the invariant the reference uses to compare RL vs ST paths."""
    w = mpc.weights_from_settings(CFG)
    delta_t = CFG.T_DISCRETIZATION
    rng = np.random.default_rng(0)
    num_s = 801
    s_values = jnp.arange(num_s, dtype=jnp.float64) * CFG.S_DISCRETIZATION
    distances = jnp.asarray(
        rng.uniform(1.0, 50.0, (CFG.num_t, num_s)), jnp.float64)
    idxs = np.cumsum(rng.integers(0, 30, CFG.num_t))
    seq = jnp.asarray(idxs * CFG.S_DISCRETIZATION, jnp.float64)
    v0, a0 = 3.0, 0.5
    total, _ = mpc.path_cost_report(
        seq, jnp.float64(v0), jnp.float64(a0), delta_t, distances,
        s_values, w)

    # scalar recomputation with the virtual start context
    est_prev = float(seq[0]) - v0 * delta_t
    est_second = est_prev - (v0 - a0 * delta_t) * delta_t
    ext = [est_second, est_prev] + [float(s) for s in seq]
    expect = 0.0
    from rl_mpc_lanemerging_tpu.ops.st_dp import _edge_cost_jerk
    for i in range(1, CFG.num_t):
        d = float(distances[i, int(idxs[i])])
        expect += float(_edge_cost_jerk(
            jnp.float64(ext[i + 2]), jnp.float64(ext[i + 1]),
            jnp.float64(ext[i]), jnp.float64(ext[i - 1]),
            jnp.float64(delta_t), jnp.float64(d), w))
    np.testing.assert_allclose(float(total), expect, rtol=1e-9)
