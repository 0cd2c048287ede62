"""Tabular Q-learning over the discretized 6-D merge state (legacy path).

Vectorized re-design of the reference's tabular RL (reference: rl.py:22-80
discretizers, rl.py:218-304 Q-update/training loop).  State =
(ego x bucket, ego speed bucket, behind-car distance bucket, ahead-car
distance bucket, behind relative-speed bucket, ahead relative-speed
bucket); Q table shape (3, 6, 5, 5, 6, 6, |JERK_VALUES|) (rl.py:228-229).

All discretizers are branchless bucketize ops so whole batches of states
discretize in one fused program; the per-episode backward Q update
(rl.py:218-225) runs as a reverse ``lax.scan``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Settings
from ..prediction import HighwayState, get_closest_cars

__all__ = ["initialize_q", "discretize_state", "q_update_episode",
           "greedy_tabular_controller"]

_X_EDGES = jnp.asarray([-66.0, -51.0])                 # rl.py:22-30
_SPEED_EDGES = jnp.asarray([2.0, 5.0, 10.0, 20.0, 30.0])   # rl.py:33-46
_REL_X_EDGES = jnp.asarray([5.0, 10.0, 20.0, 50.0])    # rl.py:49-63
_REL_V_EDGES = jnp.asarray([-15.0, -5.0, 0.0, 5.0, 15.0])  # rl.py:66-80


def initialize_q(cfg: Settings):
    """rl.py:228-229."""
    return jnp.zeros((3, 6, 5, 5, 6, 6, len(cfg.JERK_VALUES)))


def discretize_state(state: HighwayState):
    """HighwayState -> 6-tuple of bucket indices (rl.py:104-112).

    The reference buckets use < comparisons on ascending edges, i.e.
    searchsorted(side='right')... except the x bucket, which *descends*
    with x (rl.py:22-30): ego_x < -66 -> 2, < -51 -> 1, else 0.
    """
    ego_x = state.ego_x
    x_state = jnp.where(ego_x < -66.0, 2, jnp.where(ego_x < -51.0, 1, 0))
    speed_state = jnp.searchsorted(_SPEED_EDGES, state.ego_speed,
                                   side="right")
    front, behind = get_closest_cars(state)
    # absent cars sit at +-inf (rl.py:92-96) -> farthest distance bucket
    front_x = jnp.where(front[3], front[0], jnp.inf)
    behind_x = jnp.where(behind[3], behind[0], -jnp.inf)
    front_v = jnp.where(front[3], front[1], 0.0)
    behind_v = jnp.where(behind[3], behind[1], 0.0)
    before_x_state = jnp.searchsorted(_REL_X_EDGES,
                                      jnp.abs(ego_x - behind_x),
                                      side="right")
    after_x_state = jnp.searchsorted(_REL_X_EDGES,
                                     jnp.abs(ego_x - front_x),
                                     side="right")
    before_v_state = jnp.searchsorted(_REL_V_EDGES,
                                      behind_v - state.ego_speed,
                                      side="right")
    after_v_state = jnp.searchsorted(_REL_V_EDGES,
                                     front_v - state.ego_speed,
                                     side="right")
    return (x_state.astype(jnp.int32), speed_state.astype(jnp.int32),
            before_x_state.astype(jnp.int32), after_x_state.astype(jnp.int32),
            before_v_state.astype(jnp.int32), after_v_state.astype(jnp.int32))


def q_update_episode(q, visits, states6, actions, rewards, valid,
                     discount: float, step_size: float):
    """Backward per-episode Q update (rl.py:218-225): iterate the episode
    in reverse, bootstrapping from the *already-updated* table.

    states6: tuple of (T,) bucket-index arrays; actions/rewards/valid: (T,).
    The last valid transition is terminal (no bootstrap).
    """
    t_len = actions.shape[0]
    last_valid = jnp.max(jnp.where(valid, jnp.arange(t_len), -1))

    def body(carry, t):
        q, visits = carry
        idx = tuple(s[t] for s in states6)
        # bootstrap from the next state's bucket unless terminal
        nxt = tuple(s[jnp.minimum(t + 1, t_len - 1)] for s in states6)
        target = rewards[t] + jnp.where(
            t == last_valid, 0.0, discount * jnp.max(q[nxt]))
        sa = idx + (actions[t],)
        upd = (1.0 - step_size) * q[sa] + step_size * target
        do = valid[t]
        q = q.at[sa].set(jnp.where(do, upd, q[sa]))
        visits = visits.at[sa].add(jnp.where(do, 1.0, 0.0))
        return (q, visits), None

    ts = jnp.arange(t_len - 1, -1, -1)
    (q, visits), _ = jax.lax.scan(body, (q, visits), ts)
    return q, visits


def greedy_tabular_controller(q, visits, cfg: Settings,
                              epsilon: float = 0.0):
    """Batched greedy control over the table (rl.py:177-187), mapping the
    chosen jerk through the set_ego_jerk integrator."""
    table = jnp.asarray(cfg.JERK_VALUES)

    def control(states):
        idx = jax.vmap(discretize_state)(states)
        qv = q[idx]
        if cfg.AVOID_UNVISITED_STATES and visits is not None:
            qv = jnp.where(visits[idx] == 0, -jnp.inf, qv)
        action = jnp.argmax(qv, axis=-1)
        jerk = table[action]
        a = jnp.clip(states.ego_accel + jerk * cfg.TICK_LENGTH,
                     cfg.MAX_NEGATIVE_ACCELERATION,
                     cfg.MAX_POSITIVE_ACCELERATION)
        return jnp.clip(states.ego_speed + a * cfg.TICK_LENGTH,
                        0.0, cfg.MAX_SPEED)

    return control
