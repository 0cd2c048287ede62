"""Anchor the solver tower to the ACTUAL reference implementation.

Round-1 verdict: the Pallas kernel, the portable DP, and the C++ heap oracle
were all written alongside each other — nothing compared against the
reference repo itself.  This module closes that loop: the reference's pure
Python ``solve_st_fast_v2`` (st.py:361-452, the readable twin of the
production Cython kernel st_cy.pyx:315-399 — identical algorithm, identical
cost/feasibility/rounding helpers) is imported from ``/root/reference`` with
its runtime-only deps stubbed, and run on full st_default-scale grids
(18 x 3001) built by OUR grid builder from dense merge scenarios.

Chain after this file: reference st.py <-> csrc/st_oracle.cpp <-> ops/st_dp
<-> ops/st_pallas, every link differential-tested.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from rl_mpc_lanemerging_tpu.config import Settings
from rl_mpc_lanemerging_tpu.ops import oracle, st_dp
from rl_mpc_lanemerging_tpu.planner.grid import build_st_grid
from rl_mpc_lanemerging_tpu.planner.mpc import weights_from_settings
from rl_mpc_lanemerging_tpu.prediction import HighwayState

from _reference_loader import load_reference_st

CFG = Settings.load_from_file("configs/st_default.json")


def dense_merge_state(rng, cfg):
    """A merge-entry scenario with a slow platoon ahead — the grid regime the
    production controller actually faces (obstacle-rich, braking needed)."""
    K = cfg.MAX_SENSED_CARS
    ego_x = rng.uniform(-70, -45)
    n = int(rng.integers(6, 12))
    base = ego_x + rng.uniform(-5, 15)
    xs = np.sort(base + np.cumsum(rng.uniform(8, 15, n)))[::-1]
    present = np.zeros(K, bool)
    present[:n] = True
    ox = np.full(K, -1e9)
    ox[:n] = xs
    ov = np.zeros(K)
    ov[:n] = rng.uniform(4, 8, n)
    oa = np.zeros(K)
    oa[:n] = rng.uniform(-1, 1, n)
    return HighwayState(
        ego_x=jnp.float64(ego_x), ego_y=jnp.float64(-2.0),
        ego_speed=jnp.float64(rng.uniform(4, 16)),
        ego_accel=jnp.float64(rng.uniform(-3, 3)),
        other_x=jnp.asarray(ox), other_speed=jnp.asarray(ov),
        other_accel=jnp.asarray(oa), other_present=jnp.asarray(present))


def sparse_state(rng, cfg):
    """Light traffic away from the merge (mostly-free grid)."""
    K = cfg.MAX_SENSED_CARS
    n = int(rng.integers(2, 6))
    xs = np.sort(rng.uniform(-200, 60, n))[::-1]
    present = np.zeros(K, bool)
    present[:n] = True
    ox = np.full(K, -1e9)
    ox[:n] = xs
    ov = np.zeros(K)
    ov[:n] = rng.uniform(3, 12, n)
    oa = np.zeros(K)
    oa[:n] = rng.uniform(-2, 2, n)
    return HighwayState(
        ego_x=jnp.float64(rng.uniform(-150, -40)), ego_y=jnp.float64(-4.0),
        ego_speed=jnp.float64(rng.uniform(3, 20)),
        ego_accel=jnp.float64(rng.uniform(-4, 4)),
        other_x=jnp.asarray(ox), other_speed=jnp.asarray(ov),
        other_accel=jnp.asarray(oa), other_present=jnp.asarray(present))


def _grid_arrays(state, cfg):
    g = build_st_grid(state, cfg, dtype=jnp.float64)
    return (np.asarray(g.obstacles), np.asarray(g.s_values),
            np.asarray(g.t_values), float(g.ego_speed),
            np.asarray(g.distances))


@pytest.mark.parametrize("seed,dense", [(0, True), (1, True), (2, True),
                                        (3, True), (10, False), (11, False)])
def test_dp_matches_reference_solver_full_scale(seed, dense):
    """ops/st_dp vs the reference's own solve_st_fast_v2 on 18x3001 grids."""
    ref_st, _ = load_reference_st(CFG)
    rng = np.random.default_rng(seed)
    state = dense_merge_state(rng, CFG) if dense else sparse_state(rng, CFG)
    obstacles, s_values, t_values, v0, distances = _grid_arrays(state, CFG)
    a0 = float(state.ego_accel)

    ref_seq = ref_st.solve_st_fast_v2(
        obstacles, s_values, t_values, v0, a0, distances)

    w = weights_from_settings(CFG)
    max_off = st_dp.default_max_offset(
        CFG.MAX_SPEED, CFG.T_DISCRETIZATION, CFG.S_DISCRETIZATION)
    ours = np.asarray(st_dp.solve_st_fast(
        jnp.asarray(obstacles), jnp.asarray(s_values), jnp.asarray(t_values),
        jnp.float64(v0), jnp.float64(a0), jnp.asarray(distances),
        w, max_off))
    np.testing.assert_allclose(ours, ref_seq, atol=1e-9,
                               err_msg=f"seed={seed} dense={dense}")


@pytest.mark.parametrize("seed", [20, 21, 22])
def test_cpp_oracle_matches_reference_solver_full_scale(seed):
    """csrc/st_oracle.cpp vs the reference's solve_st_fast_v2 — the native
    golden that all the device kernels are measured against is itself
    anchored in the reference repo."""
    ref_st, _ = load_reference_st(CFG)
    rng = np.random.default_rng(seed)
    state = dense_merge_state(rng, CFG)
    obstacles, s_values, t_values, v0, distances = _grid_arrays(state, CFG)
    a0 = float(state.ego_accel)

    ref_seq = ref_st.solve_st_fast_v2(
        obstacles, s_values, t_values, v0, a0, distances)
    w = weights_from_settings(CFG)
    got = oracle.solve_fast(
        obstacles, s_values, t_values, v0, a0, distances,
        w.d_weight, w.v_weight, w.a_weight, w.j_weight, w.desired_speed,
        w.max_speed, w.negative_acceleration_limit,
        w.positive_acceleration_limit, w.negative_jerk_limit,
        w.positive_jerk_limit, w.min_allowed_distance)
    np.testing.assert_allclose(got, ref_seq, atol=1e-9,
                               err_msg=f"seed={seed}")
