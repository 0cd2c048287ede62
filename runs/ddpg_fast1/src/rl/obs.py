"""Observation-vector builder for the RL agents.

Vectorized re-design of the reference's state-vector construction
(reference: dqn.py:389-446 ``get_state_vector_from_base_state``).  Layout
(defaults: CARS_AHEAD=2, CARS_BEHIND=2, acceleration + speed-difference +
normalization on):

    [front_1, front_2, back_1, back_2, ego_v, ego_a, ego_x, ego_y]

where each car tuple is (accel/9, (v - v_ego)/MAX_SPEED,
(x - x_ego)/SENSOR_RADIUS, present) with front_1 the *nearest* car ahead
(the reference builds the ahead list front-to-back then reverses it,
dqn.py:411-424) and back_1 the nearest car behind; absent slots are zeros.
Ego features normalize by (MAX_SPEED, 9, 300, 100) per dqn.py:436-441.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import Settings
from ..prediction import HighwayState

__all__ = ["state_vector"]


def _nearest(state: HighwayState, ahead: bool, count: int):
    """Indices + presence of the `count` nearest cars ahead/behind."""
    dx = state.other_x - state.ego_x
    if ahead:
        mask = state.other_present & (dx > 0)
        key = jnp.where(mask, dx, jnp.inf)
    else:
        mask = state.other_present & ~(dx > 0)
        key = jnp.where(mask, -dx, jnp.inf)
    order = jnp.argsort(key)[:count]
    ok = mask[order]
    return order, ok


def state_vector(state: HighwayState, cfg: Settings) -> jax.Array:
    """(obs_dim,) observation for one scenario; vmap for batches."""
    dtype = state.ego_speed.dtype
    use_acc = cfg.USE_ACCELERATION_OF_OTHER_CARS
    per_car = 4 if use_acc else 3

    def car_feats(order, ok):
        x = jnp.where(ok, state.other_x[order] - state.ego_x, 0.0)
        if cfg.USE_SPEED_DIFFERENCE:
            v = jnp.where(ok, state.other_speed[order] - state.ego_speed,
                          0.0)
        else:
            v = jnp.where(ok, state.other_speed[order], 0.0)
        cols = []
        if use_acc:
            a = jnp.where(ok, state.other_accel[order], 0.0)
            if cfg.NORMALIZE_VECTOR_INPUT:
                a = a / 9.0
            cols.append(a)
        if cfg.NORMALIZE_VECTOR_INPUT:
            v = v / cfg.MAX_SPEED
            x = x / cfg.SENSOR_RADIUS
        cols.extend([v, x, ok.astype(dtype)])
        return jnp.stack(cols, axis=-1).reshape(-1)   # (count*per_car,)

    fo, fok = _nearest(state, True, cfg.CARS_AHEAD)
    bo, bok = _nearest(state, False, cfg.CARS_BEHIND)
    front = car_feats(fo, fok)
    back = car_feats(bo, bok)

    if cfg.NORMALIZE_VECTOR_INPUT:
        ego = jnp.stack([state.ego_speed / cfg.MAX_SPEED,
                         state.ego_accel / 9.0,
                         state.ego_x / 300.0,
                         state.ego_y / 100.0])
    else:
        ego = jnp.stack([state.ego_speed, state.ego_accel,
                         state.ego_x, state.ego_y])
    out = jnp.concatenate([front, back, ego]).astype(dtype)
    assert out.shape[0] == per_car * (cfg.CARS_AHEAD + cfg.CARS_BEHIND) + 4
    return out
