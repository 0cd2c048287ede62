"""Spatio-temporal obstacle grid builder.

Vectorized re-design of the reference's per-tick grid construction
(reference: st.py:25-70 ``find_s_t_obstacles_from_state``).  For each of the
``num_t`` horizon slices the surrounding traffic is rolled forward with the
ego-less forecaster and projected onto the discretized s axis:

* cells within ±(CAR_LENGTH + uncertainty) of an obstacle are blocked and get
  distance 0 (st.py:59-65);
* every cell records the distance to the nearest obstacle *bumper*
  (front/back at ±(CAR_LENGTH + uncertainty), st.py:52-57), initialized to
  1e10;
* cars behind ``CRASH_MIN_S - MIN_ALLOWED_DISTANCE`` do not obstruct
  (pre-merge, st.py:46-47) and cars beyond the horizon are skipped entirely
  (st.py:48-49).

Integer semantics (trunc-toward-zero cell index, st.py:20-22) are preserved.
The whole build is one ``lax.scan`` over horizon slices; vmap over scenarios.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import geometry
from ..config import Settings
from ..prediction import HighwayState, predict_step_without_ego

__all__ = ["STGrid", "build_st_grid"]


class STGrid(NamedTuple):
    obstacles: jax.Array   # (T, S) bool
    s_values: jax.Array    # (S,)
    t_values: jax.Array    # (T,)
    ego_speed: jax.Array   # ()
    distances: jax.Array   # (T, S)


def _mark_slice(state: HighwayState, s_values, start_s, delta_s,
                discrete_reach, uncertainty, cfg: Settings,
                dtype):
    """Obstacle/distance row for one time slice (st.py:44-65).

    ``discrete_reach`` (int32) and ``uncertainty`` may be traced scalars so
    the horizon scan stays branchless.
    """
    num_s = s_values.shape[0]
    obs_s = geometry.get_obstacle_s_from_x(state.other_x).astype(dtype)
    active = state.other_present \
        & (obs_s >= cfg.CRASH_MIN_S - cfg.MIN_ALLOWED_DISTANCE) \
        & (obs_s <= s_values[-1] + cfg.CAR_LENGTH)

    # distance field: min over cars of distance to either bumper, via the
    # exact identity min(|s-f|, |s-b|) = ||s - obs| - reach| with
    # f/b = obs -/+ reach (min(|y+r|, |y-r|) = ||y| - r| for r >= 0) —
    # one fewer elementwise pass over the (cars, S) tile than the
    # two-bumper formulation, bit-identical result
    reach = cfg.CAR_LENGTH + uncertainty
    y = jnp.abs(s_values[None, :] - obs_s[:, None])
    per_car = jnp.abs(y - reach)
    per_car = jnp.where(active[:, None], per_car,
                        jnp.asarray(1e10, dtype))
    distances = jnp.minimum(jnp.min(per_car, axis=0),
                            jnp.asarray(1e10, dtype))

    # blocked cells: trunc-toward-zero start index, ± body + uncertainty
    # (st.py:59-65).  The half-open index band [start-reach, start+reach)
    # is tested with the unsigned-compare interval trick — one add + one
    # compare instead of two compares + and; negative (out-of-grid)
    # offsets wrap to huge unsigned values and correctly test False, so
    # the explicit imin/imax clamps are unnecessary (iota < num_s by
    # construction)
    start_idx = ((obs_s - start_s) / delta_s).astype(jnp.int32)
    iota = jnp.arange(num_s, dtype=jnp.int32)
    dr = jnp.asarray(discrete_reach, jnp.int32)
    off = (iota[None, :] - start_idx[:, None] + dr).astype(jnp.uint32)
    cell_blocked = active[:, None] \
        & (off < (jnp.uint32(2) * dr.astype(jnp.uint32)))
    obstacles = jnp.any(cell_blocked, axis=0)
    distances = jnp.where(obstacles, jnp.zeros((), dtype), distances)
    return obstacles, distances


def build_st_grid(state: HighwayState, cfg: Settings,
                  dtype=jnp.float32) -> STGrid:
    """Build the (T, S) obstacle grid from a sensed state.

    Static shapes: T = cfg.num_t, S = cfg.num_s.  jit/vmap friendly.
    """
    num_t, num_s = cfg.num_t, cfg.num_s
    delta_s = np.asarray(cfg.S_DISCRETIZATION, np.float64)
    delta_t = np.asarray(cfg.T_DISCRETIZATION, np.float64)

    start_s = geometry.get_ego_s(state.ego_x, state.ego_y).astype(dtype)
    idx = jnp.arange(num_s, dtype=dtype)
    s_values = start_s + idx * jnp.asarray(delta_s, dtype)
    t_values = (jnp.arange(num_t, dtype=dtype)
                * jnp.asarray(delta_t, dtype))

    # static per-slice reach in cells (st.py:37-41, trunc semantics)
    t_host = np.arange(num_t, dtype=np.float64) * float(delta_t)
    unc_host = (float(cfg.START_UNCERTAINTY)
                + float(cfg.UNCERTAINTY_PER_SECOND) * t_host)
    discrete_length = int(cfg.CAR_LENGTH / float(delta_s))
    discrete_reach = np.asarray(
        [discrete_length + int(u / float(delta_s)) for u in unc_host],
        np.int32)

    obst0, dist0 = _mark_slice(state, s_values, start_s,
                               jnp.asarray(delta_s, dtype),
                               int(discrete_reach[0]), float(unc_host[0]),
                               cfg, dtype)

    # per-slice reach/uncertainty scanned in as traced scalars so the
    # horizon scan stays a single branchless program
    reach_dev = jnp.asarray(discrete_reach[1:], jnp.int32)
    unc_dev = jnp.asarray(unc_host[1:], dtype)

    def roll(carry_state, per_slice):
        reach_t, unc_t = per_slice
        nxt, _ = predict_step_without_ego(
            carry_state, float(delta_t), cfg)
        obst, dist = _mark_slice(nxt, s_values, start_s,
                                 jnp.asarray(delta_s, dtype),
                                 reach_t, unc_t, cfg, dtype)
        return nxt, (obst, dist)

    _, (obst_rest, dist_rest) = jax.lax.scan(
        roll, state, (reach_dev, unc_dev))

    obstacles = jnp.concatenate([obst0[None], obst_rest], axis=0)
    distances = jnp.concatenate([dist0[None], dist_rest], axis=0)
    return STGrid(obstacles, s_values, t_values,
                  state.ego_speed.astype(dtype), distances)
