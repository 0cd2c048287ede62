"""Batched traffic forecaster — the world model behind planner and arbiter.

TPU-native re-design of the reference's ``HighwayState`` value object and its
one-step forecasts (reference: prediction.py:9-182).  The reference stores
Python lists of sensed cars and rolls them forward with per-car loops; here a
state is a fixed-width pytree of arrays (padded, front-to-back sorted) and the
leader-chain reaction is a ``lax.scan`` over car slots, so the whole forecast
jits, vmaps over scenario batches, and differentiates.

Semantics replicated exactly:

* ``predict_step_with_ego`` (prediction.py:46-105): ego advances straight
  toward the merge point (or along the highway), followers brake with
  ``max(speed_diff, MAX_PREDICTED_DECELERATION)`` when closing within 30 m of
  their (updated) leader, the merged ego is spliced into the leader chain,
  and a crash is flagged when any updated car is within
  ``max(CAR_LENGTH, min_crash_distance)`` of the predicted ego while
  ``ego_s > 11``.
* ``predict_step_without_ego`` (prediction.py:22-44): three-way ego
  substitution (pre-merge ego / ego in front of everyone / virtual follower
  ego) computed branchlessly, then the same core step.

Absent car slots carry ``x = -inf`` so they sort to the back and fall out of
every comparison naturally.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from . import geometry
from .config import Settings

__all__ = ["HighwayState", "make_state", "empty_state",
           "predict_step_with_ego", "predict_step_without_ego",
           "get_closest_cars"]

# Interaction thresholds (reference prediction.py:11-12).
EGO_REACTION_THRESHOLD = 8.0
EGO_CRASH_THRESHOLD = 11.0
# Followers react to a closing leader within this gap (prediction.py:85).
REACTION_GAP = 30.0

_NEG_INF = -jnp.inf


class HighwayState(NamedTuple):
    """Sensor snapshot: ego pose + padded front-to-back sorted other cars."""

    ego_x: jax.Array            # ()
    ego_y: jax.Array            # ()
    ego_speed: jax.Array        # ()
    ego_accel: jax.Array        # ()
    other_x: jax.Array          # (K,) descending; -inf for absent slots
    other_speed: jax.Array      # (K,)
    other_accel: jax.Array      # (K,)
    other_present: jax.Array    # (K,) bool

    @property
    def num_slots(self) -> int:
        return self.other_x.shape[-1]


def make_state(ego_x, ego_y, ego_speed, ego_accel,
               other_x, other_speed, other_accel,
               num_slots: int = 32) -> HighwayState:
    """Build a canonical padded state from (unsorted) car arrays (host util)."""
    import numpy as np
    other_x = np.asarray(other_x, dtype=np.float64)
    other_speed = np.asarray(other_speed, dtype=np.float64)
    other_accel = np.asarray(other_accel, dtype=np.float64)
    order = np.argsort(-other_x, kind="stable")
    n = min(len(other_x), num_slots)
    xs = np.full(num_slots, -np.inf)
    vs = np.zeros(num_slots)
    accs = np.zeros(num_slots)
    present = np.zeros(num_slots, dtype=bool)
    xs[:n] = other_x[order][:n]
    vs[:n] = other_speed[order][:n]
    accs[:n] = other_accel[order][:n]
    present[:n] = True
    return HighwayState(jnp.asarray(float(ego_x)), jnp.asarray(float(ego_y)),
                        jnp.asarray(float(ego_speed)),
                        jnp.asarray(float(ego_accel)),
                        jnp.asarray(xs), jnp.asarray(vs), jnp.asarray(accs),
                        jnp.asarray(present))


def empty_state(num_slots: int = 32) -> HighwayState:
    """State with no cars and ego parked at the origin-ish sentinel
    (reference prediction.py:107-109 uses all-zero ego)."""
    z = jnp.asarray(0.0)
    return HighwayState(z, z, z, z,
                        jnp.full((num_slots,), _NEG_INF),
                        jnp.zeros(num_slots), jnp.zeros(num_slots),
                        jnp.zeros(num_slots, dtype=bool))


def _predict_ego_position(ego_x, ego_y, selected_speed, delta_t):
    """Ego moves straight toward merge_point2, clamped to the highway lane y
    (reference prediction.py:48-59)."""
    mx, my = geometry.MERGE_POINT2
    dx = mx - ego_x
    dy = my - ego_y
    norm = jnp.sqrt(dx * dx + dy * dy)
    step = selected_speed * delta_t
    pre_x = ego_x + step * dx / jnp.maximum(norm, 1e-12)
    pre_y = ego_y + step * dy / jnp.maximum(norm, 1e-12)
    pre_y = jnp.maximum(pre_y, geometry.HIGHWAY_Y)  # prediction.py:55-56
    post_x = ego_x + selected_speed * delta_t
    on_ramp = ego_x < mx
    return (jnp.where(on_ramp, pre_x, post_x),
            jnp.where(on_ramp, pre_y, ego_y))


def predict_step_with_ego(state: HighwayState, selected_speed, delta_t,
                          cfg: Settings, min_crash_distance: float = 5.0
                          ) -> Tuple[HighwayState, jax.Array]:
    """One forecast step with the ego commanding ``selected_speed``.

    Exact vectorization of reference prediction.py:46-105.  Returns
    (next_state, crashed).
    """
    selected_speed = jnp.asarray(selected_speed, state.ego_speed.dtype)
    pred_x, pred_y = _predict_ego_position(
        state.ego_x, state.ego_y, selected_speed, delta_t)
    next_accel = (selected_speed - state.ego_speed) / delta_t

    pred_s = geometry.get_ego_s(pred_x, pred_y)
    ego_can_crash = pred_s > EGO_CRASH_THRESHOLD
    ego_has_merged = pred_s > EGO_REACTION_THRESHOLD

    max_decel = cfg.MAX_PREDICTED_DECELERATION

    def body(carry, car):
        last_x, last_speed, ego_seen = carry
        x, speed, present = car
        is_behind_ego = (x < pred_x) & ~ego_seen
        # splice the merged ego into the leader chain (prediction.py:78-82)
        use_ego = is_behind_ego & ego_has_merged
        lead_x = jnp.where(use_ego, pred_x, last_x)
        lead_speed = jnp.where(use_ego, selected_speed, last_speed)
        speed_diff = lead_speed - speed
        x_diff = lead_x - x
        reacting = (speed_diff < 0) & (x_diff < REACTION_GAP)
        new_accel = jnp.where(reacting, jnp.maximum(speed_diff, max_decel),
                              0.0)
        new_speed = jnp.where(reacting, speed + new_accel * delta_t, speed)
        new_x = x + new_speed * delta_t
        # absent slots must not disturb the leader chain
        carry_x = jnp.where(present, new_x, lead_x)
        carry_speed = jnp.where(present, new_speed, lead_speed)
        ego_seen = ego_seen | (is_behind_ego & present)
        new_x = jnp.where(present, new_x, _NEG_INF)
        new_speed = jnp.where(present, new_speed, 0.0)
        new_accel = jnp.where(present, new_accel, 0.0)
        return (carry_x, carry_speed, ego_seen), (new_x, new_speed, new_accel)

    init = (jnp.asarray(jnp.inf, state.ego_x.dtype),
            jnp.asarray(0.0, state.ego_speed.dtype),
            jnp.asarray(False))
    _, (new_x, new_speed, new_accel) = jax.lax.scan(
        body, init, (state.other_x, state.other_speed, state.other_present))

    crash_distance = jnp.maximum(cfg.CAR_LENGTH, min_crash_distance)
    crashed = jnp.any(state.other_present
                      & (jnp.abs(new_x - pred_x) < crash_distance))
    crashed = crashed & ego_can_crash

    next_state = HighwayState(pred_x, pred_y, selected_speed, next_accel,
                              new_x, new_speed, new_accel,
                              state.other_present)
    return next_state, crashed


def predict_step_without_ego(state: HighwayState, delta_t, cfg: Settings,
                             min_crash_distance: float = 5.0
                             ) -> Tuple[HighwayState, jax.Array]:
    """Forecast with the ego replaced by a space-holding virtual vehicle
    (reference prediction.py:22-44), used by the planner's obstacle grid.

    Three branchless cases:
      A. ego pre-merge (s < 8) or no cars: ego unchanged, speed 0.
      B. ego ahead of every car: ghost ego at (-20, -10), speed 0.
      C. some car behind the ego: ego tails the car in front of it
         (position front_x - CAR_LENGTH - 5, its speed); if every car is in
         front, ego keeps its position at the rearmost car's speed.
    """
    ego_s = geometry.get_ego_s(state.ego_x, state.ego_y)
    present = state.other_present
    any_present = jnp.any(present)
    behind = present & (state.other_x < state.ego_x)
    any_behind = jnp.any(behind)
    first_behind = jnp.argmax(behind)  # first True in front-to-back order
    front_most_behind = behind[0]

    # car directly in front of the ego (valid when first_behind > 0)
    prev_idx = jnp.maximum(first_behind - 1, 0)
    prev_x = state.other_x[prev_idx]
    prev_speed = state.other_speed[prev_idx]

    # rearmost present car (valid when any_present)
    k = present.shape[0]
    last_idx = k - 1 - jnp.argmax(jnp.flip(present))
    rear_speed = jnp.where(any_present, state.other_speed[last_idx], 0.0)

    case_a = (ego_s < EGO_REACTION_THRESHOLD) | ~any_present
    case_b = ~case_a & front_most_behind
    case_c1 = ~case_a & ~case_b & any_behind
    # case_c2 (all cars in front) is the fallthrough

    ego_x = jnp.where(case_b, -20.0,
                      jnp.where(case_c1, prev_x - cfg.CAR_LENGTH - 5.0,
                                state.ego_x))
    ego_y = jnp.where(case_b, -10.0, state.ego_y)
    ego_speed = jnp.where(case_a, state.ego_speed,
                          jnp.where(case_b, 0.0,
                                    jnp.where(case_c1, prev_speed,
                                              state.ego_speed)))
    selected = jnp.where(case_a | case_b, 0.0,
                         jnp.where(case_c1, prev_speed, rear_speed))

    mod = state._replace(ego_x=ego_x, ego_y=ego_y, ego_speed=ego_speed)
    return predict_step_with_ego(mod, selected, delta_t, cfg,
                                 min_crash_distance)


def get_closest_cars(state: HighwayState):
    """(front_car, behind_car) as ((x, speed, accel, present), ...) arrays
    (reference prediction.py:162-182).  ``present`` flags replace the
    reference's ``None`` returns."""
    present = state.other_present
    behind = present & (state.other_x < state.ego_x)
    in_front = present & ~(state.other_x < state.ego_x)
    idx_behind = jnp.argmax(behind)
    any_behind = jnp.any(behind)
    k = present.shape[0]
    idx_front = k - 1 - jnp.argmax(jnp.flip(in_front))
    any_front = jnp.any(in_front)

    def pick(idx, ok):
        return (jnp.where(ok, state.other_x[idx], jnp.inf),
                jnp.where(ok, state.other_speed[idx], 0.0),
                jnp.where(ok, state.other_accel[idx], 0.0),
                ok)

    return pick(idx_front, any_front), pick(idx_behind, any_behind)
