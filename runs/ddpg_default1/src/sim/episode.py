"""Batched episode runtime: warmup, tick loop, on-device metrics.

TPU-native re-design of the reference's episode driver
(reference: control.py:229-363 ``run_episode``/``evaluate_control``).  The
reference runs one episode at a time against a SUMO process; here a whole
batch of B scenarios advances in lockstep inside a single jitted
``lax.while_loop`` — the controller (MPC / RL policy / combined arbiter) is
traced into the same program, so one device step performs sense -> plan ->
actuate -> simulate for every scenario with zero host involvement.

Per-tick bookkeeping mirrors control.py:269-318: sensed speed/accel
histories become running accumulators, jerk is the difference of sensed
accelerations (control.py:286-289), closest-vehicle distance is recorded
past CRASH_MIN_S (control.py:290-308), and follower disruption collects the
trailing car's deceleration (control.py:299-308).  Episodes end on arrival,
collision, or tick budget exhaustion (control.py:271-318).

Episode-boundary semantics also match: the traffic world (including the
spawner countdown) persists across episodes; each episode begins with a
``wait_before_start`` warmup period of pure traffic simulation
(control.py:257-258) before the ego is inserted at a random start speed
(control.py:198-204).
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from .. import geometry
from ..config import Settings
from ..prediction import HighwayState, get_closest_cars
from .world import WorldState, add_ego, remove_ego, sense, world_step

__all__ = ["EpisodeStats", "BIN_EDGES", "warmup", "run_episode_batch",
           "Controller"]

# x-histogram bins of the stats aggregator (reference stats.py:33)
import numpy as _np
BIN_EDGES = _np.arange(-220, 61, 20).astype(_np.float64)
NUM_BINS = len(BIN_EDGES) - 1

Controller = Callable[[HighwayState], jax.Array]


class EpisodeStats(NamedTuple):
    """Per-scenario episode metrics; every field has leading batch shape."""

    crashed: jax.Array
    merged: jax.Array
    ticks: jax.Array             # control ticks (= len(state_history))
    sum_speed: jax.Array
    max_speed: jax.Array
    sum_abs_jerk: jax.Array
    min_closest: jax.Array       # inf when never recorded
    sum_closest: jax.Array
    n_closest: jax.Array
    sum_disruption: jax.Array
    max_disruption: jax.Array
    n_disruption: jax.Array
    n_disruption_nonzero: jax.Array
    bin_counts: jax.Array        # (B, NUM_BINS)
    bin_jerk: jax.Array          # (B, NUM_BINS)
    bin_speed: jax.Array         # (B, NUM_BINS)
    bin_aux: jax.Array           # (B, NUM_BINS) controller flag per x-bin
    start_speed: jax.Array
    aux_sum: jax.Array           # (B,) controller-provided flag accumulator


def _zero_stats(batch: int, dtype) -> EpisodeStats:
    z = jnp.zeros((batch,), dtype)
    zi = jnp.zeros((batch,), jnp.int32)
    return EpisodeStats(
        crashed=jnp.zeros((batch,), bool), merged=jnp.zeros((batch,), bool),
        ticks=zi, sum_speed=z, max_speed=z, sum_abs_jerk=z,
        min_closest=jnp.full((batch,), jnp.inf, dtype), sum_closest=z,
        n_closest=zi, sum_disruption=z, max_disruption=z, n_disruption=zi,
        n_disruption_nonzero=zi,
        bin_counts=jnp.zeros((batch, NUM_BINS), dtype),
        bin_jerk=jnp.zeros((batch, NUM_BINS), dtype),
        bin_speed=jnp.zeros((batch, NUM_BINS), dtype),
        bin_aux=jnp.zeros((batch, NUM_BINS), dtype),
        start_speed=z, aux_sum=z)


@functools.partial(jax.jit, static_argnames=("cfg", "ticks"))
def warmup(world: WorldState, cfg: Settings, ticks: int) -> WorldState:
    """Advance traffic with no ego (control.py:257-258)."""
    def body(w, _):
        return jax.vmap(lambda ww: world_step(ww, ww.ego_v, cfg))(w), None
    out, _ = jax.lax.scan(body, world, None, length=ticks)
    return out


def _sample_start_speed(key, cfg: Settings, dtype):
    """Reference control.py:198-204."""
    if not cfg.RANDOMIZE_START_SPEED:
        return jnp.asarray(cfg.START_SPEED, dtype)
    v = cfg.START_SPEED + cfg.START_SPEED_VARIANCE \
        * jax.random.normal(key, dtype=dtype)
    return jnp.clip(v, cfg.MIN_START_SPEED, cfg.MAX_START_SPEED)


def _bin_index(x):
    idx = jnp.floor((x - BIN_EDGES[0]) / 20.0).astype(jnp.int32)
    return jnp.clip(idx, 0, NUM_BINS - 1)


def _tick_metrics(stats: EpisodeStats, state: HighwayState, prev_accel,
                  active, cfg: Settings) -> EpisodeStats:
    """Accumulate one control tick's metrics for active scenarios
    (control.py:280-308 + stats.py:43-74)."""
    dtype = stats.sum_speed.dtype
    speed = state.ego_speed.astype(dtype)
    accel = state.ego_accel.astype(dtype)
    first = stats.ticks == 0
    jerk = jnp.where(first, 0.0, (accel - prev_accel) / cfg.TICK_LENGTH)

    ego_s = geometry.get_ego_s(state.ego_x, state.ego_y).astype(dtype)
    front, behind = jax.vmap(get_closest_cars)(state)
    front_x = jnp.where(front[3], front[0], jnp.inf).astype(dtype)
    behind_x = jnp.where(behind[3], behind[0], jnp.inf).astype(dtype)
    behind_decel = jnp.where(behind[3],
                             -jnp.minimum(behind[2], 0.0), 0.0).astype(dtype)
    min_dist = jnp.minimum(jnp.minimum(jnp.abs(front_x - state.ego_x),
                                       jnp.abs(behind_x - state.ego_x)),
                           100.0).astype(dtype)
    past_merge = ego_s > cfg.MERGE_POINT_X          # quirk kept: s vs x
    rec_closest = active & past_merge & (ego_s > cfg.CRASH_MIN_S)
    rec_disrupt = active & past_merge

    b = _bin_index(state.ego_x.astype(dtype))
    one = jnp.where(active, 1.0, 0.0).astype(dtype)
    bin_counts = stats.bin_counts.at[jnp.arange(one.shape[0]), b].add(one)
    bin_jerk = stats.bin_jerk.at[jnp.arange(one.shape[0]), b].add(
        one * jnp.abs(jerk))
    bin_speed = stats.bin_speed.at[jnp.arange(one.shape[0]), b].add(
        one * jnp.abs(speed))

    return stats._replace(
        ticks=stats.ticks + active.astype(jnp.int32),
        sum_speed=stats.sum_speed + jnp.where(active, speed, 0.0),
        max_speed=jnp.where(active, jnp.maximum(stats.max_speed, speed),
                            stats.max_speed),
        sum_abs_jerk=stats.sum_abs_jerk
        + jnp.where(active, jnp.abs(jerk), 0.0),
        min_closest=jnp.where(rec_closest,
                              jnp.minimum(stats.min_closest, min_dist),
                              stats.min_closest),
        sum_closest=stats.sum_closest + jnp.where(rec_closest, min_dist,
                                                  0.0),
        n_closest=stats.n_closest + rec_closest.astype(jnp.int32),
        sum_disruption=stats.sum_disruption
        + jnp.where(rec_disrupt, behind_decel, 0.0),
        max_disruption=jnp.where(
            rec_disrupt, jnp.maximum(stats.max_disruption, behind_decel),
            stats.max_disruption),
        n_disruption=stats.n_disruption + rec_disrupt.astype(jnp.int32),
        n_disruption_nonzero=stats.n_disruption_nonzero
        + (rec_disrupt & (behind_decel != 0.0)).astype(jnp.int32),
        bin_counts=bin_counts, bin_jerk=bin_jerk, bin_speed=bin_speed)


@functools.partial(jax.jit,
                   static_argnames=("cfg", "controller", "max_episode_length",
                                    "wait_before_start", "limit_metrics",
                                    "record_history"))
def run_episode_batch(world: WorldState, cfg: Settings,
                      controller: Controller,
                      max_episode_length: float = 100.0,
                      wait_before_start: float = 50.0,
                      limit_metrics: bool = False,
                      record_history: bool = False,
                      controller_carry=None):
    """One full episode for every scenario in the batch.

    ``world`` is a batched WorldState pytree (leading axis B).  Returns
    (world_after, EpisodeStats) — plus a per-tick ``HighwayState`` history
    pytree of shape (B, max_ticks+1, ...) when ``record_history`` (the
    crash-forensics capture; reference control.py:280-281 state_history +
    stats.py:75-77 crash pickling).  The loop runs until every scenario has
    terminated (arrival / collision / tick budget), scenarios that finish
    early are frozen — identical semantics to running the reference's
    sequential episodes B times.

    ``controller_carry``: optional batched pytree of per-scenario
    controller state; when given, ``controller`` is called as
    ``controller(state, carry) -> (out, carry)`` and the carry persists
    across ticks AND episodes within the round (like the reference's
    ``takeover_history``, dqn.py:126-127, which is never reset).
    """
    batch = world.ego_arc.shape[0]
    dtype = world.ego_arc.dtype
    max_ticks = int(max_episode_length / cfg.TICK_LENGTH)
    warm_ticks = int(wait_before_start / cfg.TICK_LENGTH)

    world = warmup(world, cfg, warm_ticks)

    keys = jax.vmap(jax.random.split)(world.rng)
    world = world._replace(rng=keys[:, 0])
    start_speeds = jax.vmap(
        lambda k: _sample_start_speed(k, cfg, dtype))(keys[:, 1])
    world = jax.vmap(add_ego)(world, start_speeds)
    # the insertion step (control.py:264): ego holds its depart speed
    world = jax.vmap(lambda w, v: world_step(w, v, cfg))(world, start_speeds)

    stats0 = _zero_stats(batch, dtype)._replace(start_speed=start_speeds)
    prev_accel0 = jnp.zeros((batch,), dtype)
    done0 = jnp.zeros((batch,), bool)
    state0 = sense_batch(world, cfg)
    if record_history:
        hist0 = jax.tree.map(
            lambda x: jnp.zeros((batch, max_ticks + 1) + x.shape[1:],
                                x.dtype), state0)
    else:
        hist0 = None

    def cond(carry):
        w, stats, prev_a, done, tick, hist, c_carry = carry
        return (~jnp.all(done)) & (tick <= max_ticks)

    def body(carry):
        w, stats, prev_a, done, tick, hist, c_carry = carry

        arrived = w.ego_arrived & ~done
        collided = w.ego_collided & ~done
        newly_done = arrived | collided
        stats = stats._replace(
            merged=stats.merged | arrived,
            crashed=stats.crashed | collided)
        done = done | newly_done
        active = ~done

        state = sense_batch(w, cfg)
        if record_history:
            idx = jnp.where(active, stats.ticks, max_ticks)  # scratch row
            rows = jnp.arange(batch)
            hist = jax.tree.map(
                lambda h, s: h.at[rows, idx].set(s), hist, state)
        if not limit_metrics:
            stats = _tick_metrics(stats, state, prev_a, active, cfg)
        else:
            stats = stats._replace(
                ticks=stats.ticks + active.astype(jnp.int32))
        prev_a = jnp.where(active, state.ego_accel.astype(dtype), prev_a)

        if controller_carry is not None:
            out, c_carry = controller(state, c_carry)
        else:
            out = controller(state)
        if isinstance(out, tuple):
            speed_cmd, aux = out
            aux_on = jnp.where(active, aux.astype(dtype), 0.0)
            # ST-takeover flag per x-bin (the reference's takeover-vs-x
            # histogram, dqn.py:215-226 plot_st_proportion)
            bi = _bin_index(state.ego_x.astype(dtype))
            stats = stats._replace(
                aux_sum=stats.aux_sum + aux_on,
                bin_aux=stats.bin_aux.at[
                    jnp.arange(batch), bi].add(aux_on))
        else:
            speed_cmd = out
        speed_cmd = speed_cmd.astype(dtype)
        # frozen scenarios coast (their world is masked below anyway)
        speed_cmd = jnp.where(active, speed_cmd, w.ego_v)
        w_next = jax.vmap(lambda ww, c: world_step(ww, c, cfg))(w, speed_cmd)
        w = jax.tree.map(
            lambda new, old: _mask_select(active, new, old), w_next, w)
        return (w, stats, prev_a, done, tick + 1, hist, c_carry)

    carry = (world, stats0, prev_accel0, done0, jnp.asarray(1, jnp.int32),
             hist0, controller_carry)
    w, stats, prev_a, done, tick, hist, c_carry = jax.lax.while_loop(
        cond, body, carry)

    # tick-budget overrun: remove ego, not merged, not crashed
    # (control.py:312-316)
    overran = ~done
    w = jax.vmap(lambda ww, o: jax.tree.map(
        lambda a, b: jnp.where(o, a, b), remove_ego(ww), ww))(w, overran)
    out = (w, stats, hist) if record_history else (w, stats)
    if controller_carry is not None:
        out = out + (c_carry,)
    return out


def _mask_select(mask, new, old):
    m = mask.reshape(mask.shape + (1,) * (new.ndim - mask.ndim))
    return jnp.where(m, new, old)


def sense_batch(world: WorldState, cfg: Settings) -> HighwayState:
    return jax.vmap(lambda w: sense(w, cfg))(world)
