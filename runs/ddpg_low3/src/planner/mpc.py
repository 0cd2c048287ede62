"""Receding-horizon MPC controller and safety certificate.

TPU-native re-design of the reference's per-tick controller loop body
(reference: st.py:726-814): build the obstacle grid, run the lattice DP,
trim the trailing zeros the solver emits when a full-horizon path does not
exist ("crash inevitable", st.py:762-768), refine to tick resolution with
the QP smoother (st.py:770-772), and execute the first step as a speed
command via the Euler update (st.py:779-783).

Everything here is a pure function of a sensed ``HighwayState``; batching
is ``vmap`` over scenarios and the whole controller jits into a single XLA
program per tick (grid + DP + QP fused — no host round-trips).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import Settings
from ..ops import qp, st_dp
from ..prediction import HighwayState
from .grid import STGrid, build_st_grid

__all__ = ["weights_from_settings", "PlanResult", "plan_st",
           "st_control_speed", "test_guaranteed_crash", "batched_controller"]


def weights_from_settings(cfg: Settings) -> st_dp.STWeights:
    """Solver parameter pack (mirrors the argument list the reference passes
    at st.py:740-746)."""
    return st_dp.STWeights(
        d_weight=cfg.D_WEIGHT, v_weight=cfg.V_WEIGHT, a_weight=cfg.A_WEIGHT,
        j_weight=cfg.J_WEIGHT, desired_speed=cfg.DESIRED_SPEED,
        max_speed=cfg.MAX_SPEED,
        negative_acceleration_limit=cfg.MAX_NEGATIVE_ACCELERATION,
        positive_acceleration_limit=cfg.MAX_POSITIVE_ACCELERATION,
        negative_jerk_limit=cfg.MINIMUM_NEGATIVE_JERK,
        positive_jerk_limit=cfg.MAXIMUM_POSITIVE_JERK,
        min_allowed_distance=cfg.MIN_ALLOWED_DISTANCE)


class PlanResult(NamedTuple):
    s_sequence: jax.Array   # (T,) coarse DP path, zero-filled tail
    valid_len: jax.Array    # () int32: points before the zero tail
    grid: STGrid


def plan_st(state: HighwayState, cfg: Settings, dtype=jnp.float32
            ) -> PlanResult:
    """Grid build + DP solve + trailing-zero trim (st.py:726-768)."""
    grid = build_st_grid(state, cfg, dtype=dtype)
    w = weights_from_settings(cfg)
    max_off = st_dp.default_max_offset(
        cfg.MAX_SPEED, cfg.T_DISCRETIZATION, cfg.S_DISCRETIZATION)
    if cfg.USE_FAST_ST_SOLVER:
        seq = st_dp.solve_st_fast(
            grid.obstacles, grid.s_values, grid.t_values, grid.ego_speed,
            state.ego_accel.astype(dtype), grid.distances, w, max_off)
    else:
        seq = st_dp.solve_st_no_jerk_fast(
            grid.obstacles, grid.s_values, grid.t_values, grid.ego_speed,
            grid.distances, w, max_off)
    num_t = seq.shape[0]
    trailing = jnp.argmax(jnp.flip(seq) != 0.0)
    all_zero = jnp.all(seq == 0.0)
    valid = jnp.where(all_zero, 1, num_t - trailing).astype(jnp.int32)
    return PlanResult(seq, valid, grid)


def st_control_speed(state: HighwayState, cfg: Settings, dtype=jnp.float32):
    """Full ``do_st_control`` (st.py:757-783): returns the speed command for
    this tick and the plan (for metrics / the combined arbiter).

    When the smoothed plan has <= 1 usable point the reference holds the
    current speed (st.py:774-777).
    """
    plan = plan_st(state, cfg, dtype)
    if cfg.TICK_LENGTH < cfg.T_DISCRETIZATION:
        op = qp.build_operator(cfg.fine_horizon, cfg.TICK_LENGTH)
        fine, fine_len = qp.finer_fit_qp(
            plan.s_sequence, plan.valid_len,
            state.ego_speed.astype(dtype), state.ego_accel.astype(dtype),
            op, cfg.T_DISCRETIZATION, cfg.MAX_SPEED,
            cfg.MAX_POSITIVE_ACCELERATION, cfg.MAX_NEGATIVE_ACCELERATION,
            cfg.MAXIMUM_POSITIVE_JERK, cfg.MINIMUM_NEGATIVE_JERK,
            iterations=cfg.QP_ITERATIONS)
        step_dt = cfg.TICK_LENGTH
    else:
        fine, fine_len = plan.s_sequence, plan.valid_len
        step_dt = cfg.T_DISCRETIZATION

    speed = (fine[1] - fine[0]) / step_dt
    degenerate = fine_len <= 1
    speed = jnp.where(degenerate, state.ego_speed.astype(dtype), speed)
    return speed, plan, fine, fine_len


def test_guaranteed_crash(state: HighwayState, cfg: Settings,
                          dtype=jnp.float32):
    """Safety certificate (st.py:790-802): True when the solver cannot find
    a complete horizon path from ``state``, or the found path passes closer
    than COMBINATION_MIN_DISTANCE - CAR_LENGTH to an obstacle."""
    plan = plan_st(state, cfg, dtype)
    num_t = plan.s_sequence.shape[0]
    incomplete = plan.valid_len < num_t

    grid = plan.grid
    delta_s = grid.s_values[1] - grid.s_values[0]
    idx = ((plan.s_sequence - grid.s_values[0]) / delta_s).astype(jnp.int32)
    idx = jnp.clip(idx, 0, grid.s_values.shape[0] - 1)
    t_iota = jnp.arange(num_t)
    d = grid.distances[t_iota, idx]
    threshold = cfg.COMBINATION_MIN_DISTANCE - cfg.CAR_LENGTH
    too_close = jnp.any((t_iota < plan.valid_len) & (d < threshold))
    return incomplete | too_close


@functools.partial(jax.jit, static_argnames=("cfg",))
def batched_controller(states: HighwayState, cfg: Settings):
    """vmapped ST controller: (B,)-batched HighwayState -> (B,) speed
    commands.  This is the flagship fused per-tick program."""
    fn = lambda s: st_control_speed(s, cfg)[0]
    return jax.vmap(fn)(states)


@functools.lru_cache(maxsize=8)
def _pallas_solver(cfg: Settings):
    from ..ops.st_pallas import make_pallas_solver
    w = weights_from_settings(cfg)
    max_off = st_dp.default_max_offset(
        cfg.MAX_SPEED, cfg.T_DISCRETIZATION, cfg.S_DISCRETIZATION)
    return make_pallas_solver(cfg.T_DISCRETIZATION, cfg.S_DISCRETIZATION,
                              w, max_off, cfg.num_t, cfg.num_s)


def batched_controller_pallas(states: HighwayState, cfg: Settings):
    """TPU production controller: jnp grid build + Pallas wavefront DP +
    batched QP.  Batch must be a multiple of ops.st_pallas.LANE_TILE."""
    dtype = jnp.float32
    grids = jax.vmap(lambda s: build_st_grid(s, cfg, dtype))(states)
    seq = _pallas_solver(cfg)(
        grids.obstacles, grids.s_values, grids.ego_speed,
        states.ego_accel.astype(dtype), grids.distances)
    num_t = seq.shape[1]
    trailing = jnp.argmax(jnp.flip(seq, axis=1) != 0.0, axis=1)
    all_zero = jnp.all(seq == 0.0, axis=1)
    valid = jnp.where(all_zero, 1, num_t - trailing).astype(jnp.int32)

    if cfg.TICK_LENGTH < cfg.T_DISCRETIZATION:
        op = qp.build_operator(cfg.fine_horizon, cfg.TICK_LENGTH)
        fine, fine_len = jax.vmap(
            lambda sq, vl, v, a: qp.finer_fit_qp(
                sq, vl, v, a, op, cfg.T_DISCRETIZATION, cfg.MAX_SPEED,
                cfg.MAX_POSITIVE_ACCELERATION,
                cfg.MAX_NEGATIVE_ACCELERATION,
                cfg.MAXIMUM_POSITIVE_JERK, cfg.MINIMUM_NEGATIVE_JERK,
                iterations=cfg.QP_ITERATIONS))(
            seq, valid, states.ego_speed.astype(dtype),
            states.ego_accel.astype(dtype))
        step_dt = cfg.TICK_LENGTH
    else:
        fine, fine_len = seq, valid
        step_dt = cfg.T_DISCRETIZATION

    speed = (fine[:, 1] - fine[:, 0]) / step_dt
    speed = jnp.where(fine_len <= 1, states.ego_speed.astype(dtype), speed)
    return speed


def make_batched_controller(cfg: Settings, force_reference: bool = False):
    """Pick the production controller for the current backend: the Pallas
    path on accelerators, the portable vmapped path elsewhere."""
    if not force_reference and jax.default_backend() != "cpu":
        return jax.jit(functools.partial(batched_controller_pallas,
                                         cfg=cfg))
    return jax.jit(functools.partial(batched_controller, cfg=cfg))
