"""Batched, asynchronously-resetting RL environment over the merge world.

TPU-native re-design of the reference's Gym environments
(reference: merge_gym.py:15-246 ``JerkEnv`` / ``AccelerationEnv`` /
``ContinuousJerkEnv``).  The reference wraps one SUMO process per env; here
B scenarios run in lockstep and each scenario manages its own episode
phase: a per-scenario warmup countdown replaces the blocking
``reset``-time warmup loop (merge_gym.py:142-149), so finished scenarios
re-enter warmup while others keep training — the batch never stalls.

Action semantics replicated:

* discrete jerk (5 actions) and continuous jerk: clamp the projected
  acceleration/speed and record the invalid-action penalty + projected
  jerk (merge_gym.py:83-96 ``_handle_jerk``), then actuate through the
  jerk->speed integrator (control.py:160-179 ``set_ego_jerk``);
* discrete acceleration (20 actions): jerk-clamped acceleration targets
  actuated as speed commands (merge_gym.py:193-213);
* rewards are computed from the *next* sensed state with the sensed jerk
  (merge_gym.py:128-140), with the crash/arrival terminal branches using
  an empty state and the projected jerk (merge_gym.py:108-117);
* episodes end on collision, arrival, or the tick budget
  (merge_gym.py:118-126); the ego is removed on timeout.
"""

from __future__ import annotations

import enum
import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..config import Settings
from ..prediction import HighwayState, empty_state
from ..rl.obs import state_vector
from ..rl.rewards import get_reward_function
from ..sim.episode import _sample_start_speed
from ..sim.world import WorldState, add_ego, remove_ego, sense, world_step

__all__ = ["EnvKind", "MergeEnvState", "env_reset", "env_step"]


class EnvKind(str, enum.Enum):
    JERK = "jerk"                # sumo-jerk-v0
    ACCELERATION = "accel"       # sumo-accel-v0
    CONTINUOUS_JERK = "jerk-continuous"  # sumo-jerk-continuous-v0


class MergeEnvState(NamedTuple):
    world: WorldState            # batched
    prev_accel: jax.Array        # (B,) previous sensed ego acceleration
    ticks: jax.Array             # (B,) control ticks this episode
    warmup_left: jax.Array       # (B,) ticks of traffic-only warmup left
    obs: jax.Array               # (B, D) current observation
    state: HighwayState          # batched sensed state (for rollouts)


def _sense_all(world, cfg):
    return jax.vmap(lambda w: sense(w, cfg))(world)


def _obs_all(states, cfg):
    return jax.vmap(lambda s: state_vector(s, cfg))(states)


@functools.partial(jax.jit, static_argnames=("cfg", "wait_before_start"))
def env_reset(world: WorldState, cfg: Settings,
              wait_before_start: float = 20.0) -> MergeEnvState:
    """Start every scenario in its warmup phase."""
    b = world.ego_arc.shape[0]
    warm = int(wait_before_start / cfg.TICK_LENGTH)
    dtype = world.ego_arc.dtype
    env = MergeEnvState(
        world=world,
        prev_accel=jnp.zeros((b,), dtype),
        ticks=jnp.zeros((b,), jnp.int32),
        warmup_left=jnp.full((b,), warm, jnp.int32),
        obs=jnp.zeros((b, cfg.obs_dim), dtype),
        state=_sense_all(world, cfg))
    return env


def _apply_action(env: MergeEnvState, action, cfg: Settings,
                  kind: EnvKind):
    """-> (speed_command, projected_jerk, invalid_penalty)."""
    dtype = env.world.ego_arc.dtype
    dt = cfg.TICK_LENGTH
    v = env.state.ego_speed.astype(dtype)
    a = env.state.ego_accel.astype(dtype)
    penalty_rate = cfg.INVALID_ACTION_PENALTY * dt

    if kind == EnvKind.ACCELERATION:
        table = jnp.asarray(cfg.ACCELERATION_VALUES_DQN, dtype)
        proj_a = table[action]
        proj_v = v + proj_a * dt
        proj_jerk = (proj_a - env.prev_accel) / dt
        jerk_hi = proj_jerk > cfg.MAXIMUM_POSITIVE_JERK
        jerk_lo = proj_jerk < cfg.MINIMUM_NEGATIVE_JERK
        speed_bad = (proj_v > cfg.MAX_SPEED) | (proj_v < 0.0)
        invalid = jerk_hi | jerk_lo | speed_bad
        # jerk-clamped branches actuate through set_ego_jerk
        jerk_cmd = jnp.clip(proj_jerk, cfg.MINIMUM_NEGATIVE_JERK,
                            cfg.MAXIMUM_POSITIVE_JERK)
        new_a = jnp.clip(a + jerk_cmd * dt, cfg.MAX_NEGATIVE_ACCELERATION,
                         cfg.MAX_POSITIVE_ACCELERATION)
        speed_from_jerk = jnp.clip(v + new_a * dt, 0.0, cfg.MAX_SPEED)
        clipped_v = jnp.clip(proj_v, 0.0, cfg.MAX_SPEED)
        recomputed_a = (clipped_v - v) / dt
        out_jerk = jnp.where(
            jerk_hi, cfg.MAXIMUM_POSITIVE_JERK,
            jnp.where(jerk_lo, cfg.MINIMUM_NEGATIVE_JERK,
                      jnp.where(speed_bad,
                                (recomputed_a - env.prev_accel) / dt,
                                proj_jerk)))
        speed_cmd = jnp.where(jerk_hi | jerk_lo, speed_from_jerk, clipped_v)
        return speed_cmd, out_jerk, \
            jnp.where(invalid, penalty_rate, 0.0).astype(dtype)

    if kind == EnvKind.JERK:
        table = jnp.asarray(cfg.JERK_VALUES_DQN, dtype)
        jerk = table[action]
    else:
        jerk = jnp.asarray(action, dtype).reshape(v.shape)

    # _handle_jerk (merge_gym.py:83-96): projections use prev sensed accel
    proj_a = env.prev_accel + jerk * dt
    proj_v = v + proj_a * dt
    accel_bad = (proj_a > cfg.MAX_POSITIVE_ACCELERATION) \
        | (proj_a < cfg.MAX_NEGATIVE_ACCELERATION)
    proj_a_cl = jnp.clip(proj_a, cfg.MAX_NEGATIVE_ACCELERATION,
                         cfg.MAX_POSITIVE_ACCELERATION)
    speed_bad = ~accel_bad & ((proj_v > cfg.MAX_SPEED) | (proj_v < 0.0))
    proj_v_cl = jnp.clip(proj_v, 0.0, cfg.MAX_SPEED)
    proj_a_final = jnp.where(speed_bad, (proj_v_cl - v) / dt, proj_a_cl)
    proj_jerk = (proj_a_final - env.prev_accel) / dt
    invalid = accel_bad | speed_bad
    # actuation = set_ego_jerk from *sensed* accel (control.py:174-179)
    new_a = jnp.clip(a + jerk * dt, cfg.MAX_NEGATIVE_ACCELERATION,
                     cfg.MAX_POSITIVE_ACCELERATION)
    speed_cmd = jnp.clip(v + new_a * dt, 0.0, cfg.MAX_SPEED)
    return speed_cmd, proj_jerk, \
        jnp.where(invalid, penalty_rate, 0.0).astype(dtype)


@functools.partial(jax.jit, static_argnames=("cfg", "kind",
                                             "max_episode_length",
                                             "wait_before_start"))
def env_step(env: MergeEnvState, action, cfg: Settings,
             kind: EnvKind = EnvKind.CONTINUOUS_JERK,
             max_episode_length: float = 100.0,
             wait_before_start: float = 20.0):
    """One batched env tick with asynchronous auto-reset.

    Returns (env', transition) where transition carries
    (obs, action, reward, next_obs, terminal, valid): ``valid`` is False
    for scenarios in warmup (no learnable transition this tick).
    """
    dtype = env.world.ego_arc.dtype
    b = env.ticks.shape[0]
    max_ticks = int(max_episode_length / cfg.TICK_LENGTH)
    warm = int(wait_before_start / cfg.TICK_LENGTH)
    reward_fn = get_reward_function(cfg)

    in_warmup = env.warmup_left > 0
    running = ~in_warmup

    speed_cmd, proj_jerk, invalid_penalty = _apply_action(
        env, action, cfg, kind)
    # warmup scenarios coast their (absent) ego
    speed_cmd = jnp.where(running, speed_cmd, env.world.ego_v)

    world = jax.vmap(lambda w, c: world_step(w, c, cfg))(
        env.world, speed_cmd)

    collided = running & world.ego_collided
    arrived = running & world.ego_arrived
    ticks = env.ticks + running.astype(jnp.int32)
    timeout = running & ~collided & ~arrived & (ticks >= max_ticks)
    done = collided | arrived | timeout

    next_states = _sense_all(world, cfg)
    next_obs = _obs_all(next_states, cfg)
    jerk_sensed = (next_states.ego_accel.astype(dtype) - env.prev_accel) \
        / cfg.TICK_LENGTH

    # rewards (merge_gym.py:108-140)
    empty = jax.tree.map(lambda x: jnp.broadcast_to(x, (b,) + x.shape),
                         empty_state(cfg.MAX_SENSED_CARS))
    r_term = jax.vmap(lambda s, j, c, a2: reward_fn(s, j, c, a2, cfg))(
        empty, proj_jerk, collided, arrived)
    r_live = jax.vmap(lambda s, j: reward_fn(
        s, j, jnp.asarray(False), jnp.asarray(False), cfg))(
        next_states, jerk_sensed)
    reward = jnp.where(collided | arrived, r_term, r_live) \
        + invalid_penalty
    obs_out = jnp.where((collided | arrived)[:, None],
                        jnp.zeros_like(next_obs), next_obs)

    transition = dict(obs=env.obs, action=action, reward=reward,
                      next_obs=obs_out, terminal=collided | arrived,
                      done=done, valid=running, collided=collided,
                      arrived=arrived)

    # --- async reset bookkeeping ---
    # timeout removes the ego (merge_gym.py:124-125); all done scenarios
    # re-enter warmup
    world = jax.vmap(lambda w, d: jax.tree.map(
        lambda x, y: jnp.where(d, x, y), remove_ego(w), w))(world, done)
    warmup_left = jnp.where(done, warm,
                            jnp.maximum(env.warmup_left - 1, 0))
    # scenarios whose warmup just finished get their ego inserted
    spawn_now = in_warmup & (env.warmup_left == 1)
    keys = jax.vmap(jax.random.split)(world.rng)
    rng_next = keys[:, 0]
    start_speed = jax.vmap(
        lambda k: _sample_start_speed(k, cfg, dtype))(keys[:, 1])
    spawned = jax.vmap(add_ego)(world, start_speed)
    world = jax.vmap(lambda sn, ws, wo: jax.tree.map(
        lambda x, y: jnp.where(sn, x, y), ws, wo))(spawn_now, spawned,
                                                   world)
    world = world._replace(rng=rng_next)

    states2 = _sense_all(world, cfg)
    env2 = MergeEnvState(
        world=world,
        prev_accel=jnp.where(done | spawn_now, 0.0,
                             jnp.where(running,
                                       next_states.ego_accel.astype(dtype),
                                       env.prev_accel)),
        ticks=jnp.where(done | spawn_now, 0, ticks),
        warmup_left=warmup_left,
        obs=_obs_all(states2, cfg),
        state=states2)
    return env2, transition
