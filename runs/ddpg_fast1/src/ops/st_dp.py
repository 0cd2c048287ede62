"""Dense wavefront DP solver for the (t, s) trajectory lattice.

TPU-native replacement for the reference's native heap-Dijkstra kernels
(reference: st_cy.pyx:315-399 ``solve_s_t_path_fast`` and
st_cy.pyx:209-312 ``solve_s_t_path_no_jerk_fast``).  The reference expands
nodes one at a time from a priority queue; that is unvectorizable.  Here we
exploit the lattice structure: every edge advances exactly one time layer and
every edge cost is strictly positive, so settling layer t+1 as

    V[t+1, j] = min_i  V[t, i] + edge_cost(i -> j)

over *all* layer-t nodes yields costs identical to Dijkstra's settle values
(any node Dijkstra would settle later than a target cannot improve it, since
its own cost already exceeds the target's).  Tie-breaking also matches: the
heap orders equal-cost entries by predecessor s-index ascending, and our
argmin scans candidates in ascending predecessor order.

The kinematic reachability band is narrow (|Δv| <= 3*Δa_max*dt cells) but its
*offset* from the source is the velocity (up to ~180 cells at 30 m/s), so the
transition is a banded gather over `max_offset` shifted views of the value
vector — a fully regular access pattern that XLA fuses into one pass (and
that the Pallas kernel tiles through VMEM).

Float semantics (cost expression order, ceil/trunc index rounding,
``distance_penalty``) mirror st_cy.pyx:34-93 operation-for-operation so that
float64 runs are bit-comparable against the native oracle in `csrc/`.

All entry points are jit-able, vmap-able and shape-static.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["STWeights", "solve_st_fast", "solve_st_no_jerk_fast",
           "default_max_offset"]


class STWeights(NamedTuple):
    """Runtime solver parameters (mirrors st_cy.pyx:315 argument list)."""

    d_weight: float
    v_weight: float
    a_weight: float
    j_weight: float
    desired_speed: float
    max_speed: float
    negative_acceleration_limit: float
    positive_acceleration_limit: float
    negative_jerk_limit: float
    positive_jerk_limit: float
    min_allowed_distance: float


def default_max_offset(max_speed: float, delta_t: float, delta_s: float) -> int:
    """Static bound on j - i: top speed covers max_speed*dt of s per step."""
    return int(max_speed * delta_t / delta_s) + 2


def _distance_penalty(min_distance, min_allowed_distance):
    """reference st_cy.pyx:34-38 (note: weight applied by the caller)."""
    near = 1000000.0 / jnp.maximum(min_distance, 1.0)
    far = 1.0 / min_distance
    return jnp.where(min_distance < min_allowed_distance, near, far)


def _edge_cost_jerk(s, s_1, s_2, s_3, delta_t, min_distance, w: STWeights):
    """reference st_cy.pyx:46-50 ``cost_with_jerk``."""
    v = (s - s_1) / delta_t
    a = (s - 2.0 * s_1 + s_2) / (delta_t * delta_t)
    j = (s - 3.0 * s_1 + 3.0 * s_2 - s_3) / (delta_t * delta_t * delta_t)
    return (w.v_weight * (v - w.desired_speed) ** 2
            + w.a_weight * a ** 2
            + w.j_weight * j ** 2
            + w.d_weight * _distance_penalty(min_distance,
                                             w.min_allowed_distance))


def _edge_cost_no_jerk(s, s_1, s_2, delta_t, min_distance, w: STWeights):
    """reference st_cy.pyx:41-44 ``cost`` (module-constant weights there;
    we take them from `w` so the Python-level config is honored)."""
    v = (s - s_1) / delta_t
    a = (s - 2.0 * s_1 + s_2) / (delta_t * delta_t)
    return (w.v_weight * (v - w.desired_speed) ** 2
            + w.a_weight * a ** 2
            + w.d_weight * _distance_penalty(min_distance,
                                             w.min_allowed_distance))


def _range_indices(start_s, delta_s, range_min, range_max):
    """Inclusive index interval [lo, hi] of grid values within
    [range_min, range_max]; exact integer semantics of st_cy.pyx:78-93
    (ceil via trunc-then-bump for the lower bound, trunc for the upper)."""
    lo_exact = (range_min - start_s) / delta_s
    lo = lo_exact.astype(jnp.int32)
    lo = lo + (lo.astype(lo_exact.dtype) < lo_exact).astype(jnp.int32)
    hi = ((range_max - start_s) / delta_s).astype(jnp.int32)
    return lo, hi


def _feasible_range_with_jerk(s, s_1, s_2, delta_t, w: STWeights):
    """reference st_cy.pyx:65-75."""
    prev_v = (s_1 - s_2) / delta_t
    v = (s - s_1) / delta_t
    a = (v - prev_v) / delta_t
    min_a = jnp.maximum(a + w.negative_jerk_limit * delta_t,
                        w.negative_acceleration_limit)
    max_a = jnp.minimum(a + w.positive_jerk_limit * delta_t,
                        w.positive_acceleration_limit)
    min_v = jnp.maximum(v + min_a * delta_t, 0.0)
    max_v = jnp.minimum(v + max_a * delta_t, w.max_speed)
    return s + min_v * delta_t, s + max_v * delta_t


def _feasible_range_no_jerk(s, s_1, delta_t, w: STWeights):
    """reference st_cy.pyx:56-62."""
    v = (s - s_1) / delta_t
    min_v = jnp.maximum(v + w.negative_acceleration_limit * delta_t, 0.0)
    max_v = jnp.minimum(v + w.positive_acceleration_limit * delta_t,
                        w.max_speed)
    return s + min_v * delta_t, s + max_v * delta_t


def _backtrace(v_layers, bp_layers, s_values):
    """Reconstruct the s sequence (reference st_cy.pyx:390-399), including
    the trailing-zero fill when only a prefix of the horizon is reachable."""
    num_t = v_layers.shape[0]
    finite_any = jnp.any(jnp.isfinite(v_layers), axis=1)          # (T,)
    best_t = num_t - 1 - jnp.argmax(jnp.flip(finite_any))
    best_row = v_layers[best_t]
    best_s = jnp.argmin(best_row).astype(jnp.int32)

    def step(idx, t):
        active = t <= best_t
        out = jnp.where(active, s_values[idx], jnp.zeros((), s_values.dtype))
        nxt = jnp.where(active, bp_layers[t, idx], idx)
        return nxt, out

    ts = jnp.arange(num_t - 1, 0, -1)
    idx0, outs = jax.lax.scan(step, best_s, ts)
    seq = jnp.zeros((num_t,), s_values.dtype)
    seq = seq.at[1:].set(jnp.flip(outs))
    seq = seq.at[0].set(s_values[idx0])
    return seq


def _dp_sweep(obstacles, s_values, t_values, distances, w, max_offset,
              init_v, init_prev, init_second, with_jerk: bool):
    """Shared layered sweep; contexts (prev value[, second value]) ride along
    as per-node arrays so jerk-limited feasibility/cost see the same path
    context the heap algorithm would."""
    num_s = s_values.shape[0]
    dtype = s_values.dtype
    delta_t = t_values[1] - t_values[0]
    delta_s = s_values[1] - s_values[0]
    start_s = s_values[0]
    inf = jnp.asarray(jnp.inf, dtype)

    # candidate rows scan predecessors in ascending i (descending offset) so
    # argmin tie-breaks on the smallest predecessor index, like the heap.
    offs = jnp.arange(max_offset - 1, -1, -1, dtype=jnp.int32)     # (D,)
    j_idx = jnp.arange(num_s, dtype=jnp.int32)                     # (S,)
    src = j_idx[None, :] - offs[:, None]                           # (D, S)
    src_ok = src >= 0
    src_c = jnp.maximum(src, 0)

    def layer(carry, inputs):
        v, prev_val, second_val = carry
        obst_row, dist_row = inputs

        if with_jerk:
            mn, mx = _feasible_range_with_jerk(
                s_values, prev_val, second_val, delta_t, w)
        else:
            mn, mx = _feasible_range_no_jerk(s_values, prev_val, delta_t, w)
        lo, hi = _range_indices(start_s, delta_s, mn, mx)

        vi = v[src_c]
        si = s_values[src_c]
        pi = prev_val[src_c]
        feas = src_ok & (j_idx[None, :] >= lo[src_c]) \
            & (j_idx[None, :] <= hi[src_c]) & ~obst_row[None, :]
        sj = s_values[None, :]
        dj = dist_row[None, :]
        if with_jerk:
            qi = second_val[src_c]
            cost = _edge_cost_jerk(sj, si, pi, qi, delta_t, dj, w)
        else:
            cost = _edge_cost_no_jerk(sj, si, pi, delta_t, dj, w)
        cand = jnp.where(feas, vi + cost, inf)

        new_v = jnp.min(cand, axis=0)
        am = jnp.argmin(cand, axis=0)
        i_star = j_idx - offs[am]
        settled = jnp.isfinite(new_v)
        i_safe = jnp.where(settled, i_star, 0)
        new_prev = jnp.where(settled, s_values[i_safe],
                             jnp.zeros((), dtype))
        new_second = jnp.where(settled, prev_val[i_safe],
                               jnp.zeros((), dtype))
        return ((new_v, new_prev, new_second),
                (new_v, i_safe.astype(jnp.int32)))

    carry0 = (init_v, init_prev, init_second)
    _, (v_rows, bp_rows) = jax.lax.scan(
        layer, carry0, (obstacles[1:], distances[1:]))

    v_layers = jnp.concatenate([init_v[None], v_rows], axis=0)
    bp_layers = jnp.concatenate(
        [jnp.zeros((1, num_s), jnp.int32), bp_rows], axis=0)
    return _backtrace(v_layers, bp_layers, s_values)


@functools.partial(jax.jit, static_argnames=("w", "max_offset"))
def solve_st_fast(obstacles, s_values, t_values, ego_start_speed,
                  ego_start_acceleration, distances, w: STWeights,
                  max_offset: int):
    """Jerk-limited solver; exact dense twin of st_cy.pyx:315-399.

    Args mirror the native kernel: ``obstacles`` (T, S) bool, ``s_values``
    (S,), ``t_values`` (T,), scalar start speed/acceleration, ``distances``
    (T, S).  Returns the planned s sequence (T,), zero-filled past the
    furthest reachable layer when no complete path exists.
    """
    dtype = s_values.dtype
    num_s = s_values.shape[0]
    delta_t = t_values[1] - t_values[0]
    start_s = s_values[0]

    est_prev = start_s - ego_start_speed * delta_t
    est_second = est_prev - delta_t * (
        ego_start_speed - ego_start_acceleration * delta_t)

    inf = jnp.asarray(jnp.inf, dtype)
    iota = jnp.arange(num_s)
    init_v = jnp.where(iota == 0, jnp.zeros((), dtype), inf)
    init_prev = jnp.full((num_s,), est_prev, dtype)
    init_second = jnp.full((num_s,), est_second, dtype)

    return _dp_sweep(obstacles, s_values, t_values, distances, w, max_offset,
                     init_v, init_prev, init_second, with_jerk=True)


@functools.partial(jax.jit, static_argnames=("w", "max_offset"))
def solve_st_no_jerk_fast(obstacles, s_values, t_values, ego_start_speed,
                          distances, w: STWeights, max_offset: int):
    """No-jerk 2-D solver; dense twin of st_cy.pyx:209-312.

    The heap version seeds layer 1 directly from the virtual start context
    (st_cy.pyx:236-243); we reproduce that by seeding layer 0 at index 0 with
    context prev = start_s - v0*dt, which makes the first sweep generate the
    identical layer-1 frontier.
    """
    dtype = s_values.dtype
    num_s = s_values.shape[0]
    delta_t = t_values[1] - t_values[0]
    start_s = s_values[0]
    est_prev = start_s - ego_start_speed * delta_t

    inf = jnp.asarray(jnp.inf, dtype)
    iota = jnp.arange(num_s)
    init_v = jnp.where(iota == 0, jnp.zeros((), dtype), inf)
    init_prev = jnp.full((num_s,), est_prev, dtype)
    init_second = jnp.zeros((num_s,), dtype)

    return _dp_sweep(obstacles, s_values, t_values, distances, w, max_offset,
                     init_v, init_prev, init_second, with_jerk=False)
