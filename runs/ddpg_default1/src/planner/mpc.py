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
           "st_control_speed", "test_guaranteed_crash", "batched_controller",
           "batched_plan", "batched_st_control",
           "batched_test_guaranteed_crash"]


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


def st_control_speed(state: HighwayState, cfg: Settings, dtype=jnp.float32,
                     use_corridor: bool = False):
    """Full ``do_st_control`` (st.py:757-783): returns the speed command for
    this tick and the plan (for metrics / the combined arbiter).

    When the smoothed plan has <= 1 usable point the reference holds the
    current speed (st.py:774-777).  ``use_corridor`` adds the lead/trail
    position corridor to the smoother (reference st.py:672-705; like the
    reference's main path, it is off by default).
    """
    plan = plan_st(state, cfg, dtype)
    if cfg.TICK_LENGTH < cfg.T_DISCRETIZATION:
        op = qp.build_operator(cfg.fine_horizon, cfg.TICK_LENGTH)
        pos_lo = pos_hi = None
        if use_corridor:
            last_s = plan.s_sequence[jnp.maximum(plan.valid_len - 1, 0)]
            pos_lo, pos_hi = corridor_from_state(state, last_s, cfg, dtype)
        fine, fine_len = qp.finer_fit_qp(
            plan.s_sequence, plan.valid_len,
            state.ego_speed.astype(dtype), state.ego_accel.astype(dtype),
            op, cfg.T_DISCRETIZATION, cfg.MAX_SPEED,
            cfg.MAX_POSITIVE_ACCELERATION, cfg.MAX_NEGATIVE_ACCELERATION,
            cfg.MAXIMUM_POSITIVE_JERK, cfg.MINIMUM_NEGATIVE_JERK,
            iterations=cfg.QP_ITERATIONS, pos_lo=pos_lo, pos_hi=pos_hi)
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


def corridor_from_state(state: HighwayState, plan_last_s, cfg: Settings,
                        dtype=jnp.float32):
    """Per-fine-step position bounds from the lead/trail cars (reference
    st.py:551-581 ``get_before_after_constraints`` + the C_7 corridor rows
    of finer_fit, st.py:672-705).

    The "after" car is the one ending (at the horizon) closest ahead of the
    plan's final position; the "before" car the one ending closest behind.
    Returns (pos_lo, pos_hi) of length cfg.fine_horizon, +-inf when no
    corridor car exists or its projection is still before the merge.
    """
    from .. import geometry
    n = cfg.fine_horizon
    t_fine = jnp.arange(n, dtype=dtype) * cfg.TICK_LENGTH
    t_last = (cfg.num_t - 1) * cfg.T_DISCRETIZATION

    obs_s = geometry.get_obstacle_s_from_x(state.other_x).astype(dtype)
    v = state.other_speed.astype(dtype)
    end_s = obs_s + v * t_last
    present = state.other_present & (end_s >= -cfg.CAR_LENGTH)

    after_mask = present & (end_s > plan_last_s)
    before_mask = present & (end_s < plan_last_s)
    big = jnp.asarray(jnp.inf, dtype)
    after_idx = jnp.argmin(jnp.where(after_mask, end_s, big))
    before_idx = jnp.argmax(jnp.where(before_mask, end_s, -big))
    has_after = jnp.any(after_mask)
    has_before = jnp.any(before_mask)

    after_proj = obs_s[after_idx] + t_fine * v[after_idx]
    before_proj = obs_s[before_idx] + t_fine * v[before_idx]
    hi = jnp.where(has_after & (after_proj >= -cfg.CAR_LENGTH),
                   after_proj - cfg.CAR_LENGTH, jnp.inf)
    lo = jnp.where(has_before & (before_proj >= -cfg.CAR_LENGTH),
                   before_proj + cfg.CAR_LENGTH, -jnp.inf)
    return lo, hi


def path_cost_report(s_sequence, ego_start_speed, ego_start_acceleration,
                     delta_t, distances, s_values, w: st_dp.STWeights):
    """Path cost + kinematic-limit violation counts (reference
    st.py:291-336 ``get_path_cost``, which prints a line per violated
    limit).  Returns (total_cost, {speed/accel/jerk violation counts}); the
    cost is inf when a path point falls off the s lattice."""
    dtype = s_sequence.dtype
    n = s_sequence.shape[0]
    start_s = s_values[0]
    delta_s = s_values[1] - s_values[0]

    est_prev = s_sequence[0] - ego_start_speed * delta_t
    est_second = est_prev - (ego_start_speed
                             - ego_start_acceleration * delta_t) * delta_t
    ext = jnp.concatenate([jnp.stack([est_second, est_prev]), s_sequence])
    s = ext[3:]                    # s_i        for i in 1..n-1
    s_1 = ext[2:-1]                # s_{i-1}
    s_2 = ext[1:-2]
    s_3 = ext[:-3]

    v = (s - s_1) / delta_t
    # violations exactly as the reference checks them (v/a/j from
    # consecutive differences seeded with the measured start state)
    v_prev = jnp.concatenate([ego_start_speed[None].astype(dtype), v[:-1]])
    acc = (v - v_prev) / delta_t
    a_prev = jnp.concatenate([ego_start_acceleration[None].astype(dtype),
                              acc[:-1]])
    jerk = (acc - a_prev) / delta_t

    idx = jnp.round((s - start_s) / delta_s).astype(jnp.int32)
    on_grid = (jnp.abs(start_s + idx.astype(dtype) * delta_s - s)
               < 1e-6) & (idx >= 0) & (idx < s_values.shape[0])
    t_iota = jnp.arange(1, n)
    d = distances[t_iota, jnp.clip(idx, 0, s_values.shape[0] - 1)]
    from ..ops.st_dp import _edge_cost_jerk
    costs = _edge_cost_jerk(s, s_1, s_2, s_3, delta_t, d, w)
    total = jnp.where(jnp.all(on_grid), jnp.sum(costs),
                      jnp.asarray(jnp.inf, dtype))
    report = {
        "speed_violations": jnp.sum(v > w.max_speed),
        "accel_violations": jnp.sum((acc > w.positive_acceleration_limit)
                                    | (acc < w.negative_acceleration_limit)),
        "jerk_violations": jnp.sum((jerk > w.positive_jerk_limit)
                                   | (jerk < w.negative_jerk_limit)),
    }
    return total, report


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


def _pad_batch(x, pad: int):
    """Edge-replicate the leading (scenario) axis by ``pad`` rows so the
    Pallas lane tiling divides the batch; padded lanes are discarded."""
    if pad == 0:
        return x
    widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, widths, mode="edge")


def batched_plan(states: HighwayState, cfg: Settings, dtype=jnp.float32,
                 use_pallas: bool = False):
    """Whole-batch grid build + DP solve + trailing-zero trim.

    The batch-level twin of :func:`plan_st` (reference st.py:726-768) and
    the single solver entry the production controllers and the combined
    arbiter share.  With ``use_pallas`` the solve runs through the Pallas
    wavefront kernel (VMEM-resident, the TPU production path); otherwise
    through the portable dense DP, which materializes (max_offset, S)
    candidate tensors per layer and is only suitable for CPU/tests.

    Returns (seq (B, T), valid_len (B,) int32, grids: batched STGrid).
    """
    grids = jax.vmap(lambda s: build_st_grid(s, cfg, dtype))(states)
    ego_accel = states.ego_accel.astype(dtype)
    if use_pallas:
        from ..ops.st_pallas import LANE_TILE
        b = grids.obstacles.shape[0]
        pad = (-b) % LANE_TILE
        seq = _pallas_solver(cfg)(
            _pad_batch(grids.obstacles, pad), _pad_batch(grids.s_values, pad),
            _pad_batch(grids.ego_speed, pad), _pad_batch(ego_accel, pad),
            _pad_batch(grids.distances, pad))[:b]
    else:
        w = weights_from_settings(cfg)
        max_off = st_dp.default_max_offset(
            cfg.MAX_SPEED, cfg.T_DISCRETIZATION, cfg.S_DISCRETIZATION)
        if cfg.USE_FAST_ST_SOLVER:
            seq = jax.vmap(
                lambda g, a: st_dp.solve_st_fast(
                    g.obstacles, g.s_values, g.t_values, g.ego_speed, a,
                    g.distances, w, max_off))(grids, ego_accel)
        else:
            seq = jax.vmap(
                lambda g: st_dp.solve_st_no_jerk_fast(
                    g.obstacles, g.s_values, g.t_values, g.ego_speed,
                    g.distances, w, max_off))(grids)
    num_t = seq.shape[1]
    trailing = jnp.argmax(jnp.flip(seq, axis=1) != 0.0, axis=1)
    all_zero = jnp.all(seq == 0.0, axis=1)
    valid = jnp.where(all_zero, 1, num_t - trailing).astype(jnp.int32)
    return seq, valid, grids


def batched_st_control(states: HighwayState, cfg: Settings,
                       dtype=jnp.float32, use_pallas: bool = False):
    """Whole-batch ``do_st_control`` (st.py:757-783): DP plan + QP refine +
    first-step speed command.  Returns
    (speed (B,), seq (B, T), valid (B,), fine (B, n), fine_len (B,), grids)
    so callers (the combined arbiter's strictly-better gate, metrics) can
    reuse the intermediates without re-solving."""
    seq, valid, grids = batched_plan(states, cfg, dtype, use_pallas)
    v0 = states.ego_speed.astype(dtype)
    a0 = states.ego_accel.astype(dtype)
    if cfg.TICK_LENGTH < cfg.T_DISCRETIZATION:
        op = qp.build_operator(cfg.fine_horizon, cfg.TICK_LENGTH)
        fine, fine_len = jax.vmap(
            lambda sq, vl, v, a: qp.finer_fit_qp(
                sq, vl, v, a, op, cfg.T_DISCRETIZATION, cfg.MAX_SPEED,
                cfg.MAX_POSITIVE_ACCELERATION,
                cfg.MAX_NEGATIVE_ACCELERATION,
                cfg.MAXIMUM_POSITIVE_JERK, cfg.MINIMUM_NEGATIVE_JERK,
                iterations=cfg.QP_ITERATIONS))(seq, valid, v0, a0)
        step_dt = cfg.TICK_LENGTH
    else:
        fine, fine_len = seq, valid
        step_dt = cfg.T_DISCRETIZATION
    speed = (fine[:, 1] - fine[:, 0]) / step_dt
    speed = jnp.where(fine_len <= 1, v0, speed)
    return speed, seq, valid, fine, fine_len, grids


def batched_test_guaranteed_crash(states: HighwayState, cfg: Settings,
                                  dtype=jnp.float32,
                                  use_pallas: bool = False):
    """Whole-batch safety certificate (st.py:790-802) — the batch-level
    twin of :func:`test_guaranteed_crash`, sharing :func:`batched_plan` so
    the combined arbiter's gate c runs through the Pallas kernel on TPU."""
    seq, valid, grids = batched_plan(states, cfg, dtype, use_pallas)
    num_t = seq.shape[1]
    incomplete = valid < num_t
    delta_s = grids.s_values[:, 1] - grids.s_values[:, 0]
    idx = ((seq - grids.s_values[:, :1]) / delta_s[:, None]).astype(jnp.int32)
    idx = jnp.clip(idx, 0, grids.s_values.shape[1] - 1)
    d = jnp.take_along_axis(grids.distances, idx[:, :, None], axis=2)[..., 0]
    threshold = cfg.COMBINATION_MIN_DISTANCE - cfg.CAR_LENGTH
    t_iota = jnp.arange(num_t)
    too_close = jnp.any((t_iota[None, :] < valid[:, None]) & (d < threshold),
                        axis=1)
    return incomplete | too_close


def batched_controller_pallas(states: HighwayState, cfg: Settings):
    """TPU production controller: jnp grid build + Pallas wavefront DP +
    batched QP.  Batches that are not a multiple of ops.st_pallas.LANE_TILE
    are edge-padded for the kernel."""
    return batched_st_control(states, cfg, use_pallas=True)[0]


def batched_conditional_st(states: HighwayState, proposed_speed,
                           cfg: Settings, dtype=jnp.float32,
                           use_pallas: bool = False):
    """``do_conditional_st_based_on_first_step`` (reference st.py:805-814),
    batched: predict one tick with the ego at ``proposed_speed``; where the
    prediction crashes or the safety certificate condemns the predicted
    state, the ST controller takes over, otherwise the proposed speed
    executes.  Returns (speed (B,), st_took_over (B,) bool)."""
    from ..prediction import predict_step_with_ego
    nxt, crashed = jax.vmap(
        lambda s, sp: predict_step_with_ego(
            s, sp, cfg.TICK_LENGTH, cfg, cfg.MIN_ALLOWED_DISTANCE))(
        states, proposed_speed.astype(states.ego_speed.dtype))
    condemned = batched_test_guaranteed_crash(nxt, cfg, dtype, use_pallas)
    take = crashed | condemned
    st_speed = batched_st_control(states, cfg, dtype, use_pallas)[0]
    speed = jnp.where(take, st_speed, proposed_speed.astype(st_speed.dtype))
    return speed, take


def make_batched_controller(cfg: Settings, force_reference: bool = False):
    """Pick the production controller for the current backend: the Pallas
    path on accelerators, the portable vmapped path elsewhere."""
    if not force_reference and jax.default_backend() != "cpu":
        return jax.jit(functools.partial(batched_controller_pallas,
                                         cfg=cfg))
    return jax.jit(functools.partial(batched_controller, cfg=cfg))
