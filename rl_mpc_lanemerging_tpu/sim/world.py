"""Vectorized pure-JAX merge world — the simulation backend.

Replaces the reference's external SUMO process + TraCI TCP bridge
(reference: sumo.py:33-68, control.py:17-226) with a device-resident
vehicle-state pytree stepped entirely on-accelerator.  "Sensing" becomes a
gather, "actuation" an indexed update; the ~40 TCP round-trips per tick of
the reference are gone, and thousands of scenarios step in lockstep under
``vmap``/``pjit``.

World semantics mirrored from the reference setup:

* Traffic: Krauss-model followers (vType ``normal`` in
  merge_impossible.rou.xml: accel 4.5, decel 6.0, length 5, minGap 1,
  tau 0.5, sigma 0 -> deterministic), max speed set to OTHER_CAR_SPEED at
  launch (sumo.py:58).  Cars enter the highway at x=-245 (front bumper,
  departPos base) and leave the network at x=100 (merge.net.xml).
* Spawner: one car every BASE_TRAFFIC_INTERVAL (+U[0,1) when
  VARY_TRAFFIC_START_TIMES) seconds, with the countdown carried *across*
  episodes exactly like the reference's module-global ``delay``
  (control.py:26, 215-226).
* Ego: speed-actuated with speedMode 22 semantics (no safe-speed check, but
  accel/decel limits apply; control.py:43), driving the ramp -> internal
  merge lane -> highway route polyline; departs at ramp position 40,
  arrives at highwayahead position 50 (control.py:42).
* Collision: ego overlaps a traffic car (front-bumper distance <
  CAR_LENGTH) once it is physically on the merge (ego_s past the
  crash threshold, matching prediction.py:11-12 and SUMO's
  collision.check-junctions + mingap-factor 0 behavior).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .. import geometry
from ..config import Settings
from ..prediction import HighwayState, EGO_CRASH_THRESHOLD

__all__ = ["WorldState", "init_world", "world_step", "sense", "add_ego",
           "remove_ego", "IDM_TYPE_TABLE", "IDM_TYPE_PROBS",
           "alternate_flow_probability"]

_INACTIVE_X = -1e9
CAR_WIDTH = 1.8   # SUMO default vehicle width; no vType overrides it

# ---------------------------------------------------------------------------
# Alternate traffic distribution: the 6-personality IDM vType mix of
# merge2{,b,c}.rou.xml (reference sumo.py:36-46 selects the file by
# TRAFFIC_DENSITY; the files differ only in flow insertion probability).
# Columns: accel a, decel b, minGap s0, headway tau, speedFactor mean,
# speedFactor dev, speedFactor min, speedFactor max, vType maxSpeed,
# emergencyDecel.  Rows: aggressive, cautious, slowbrake, slow, reallyslow,
# normal (merge2.rou.xml vTypeDistribution).
# ---------------------------------------------------------------------------
import numpy as _np_mod

IDM_TYPE_TABLE = _np_mod.asarray([
    # a     b    s0   tau  sfm   sfd  sfmin sfmax vmax  emerg
    [4.5,  6.0,  2.0, 0.5, 1.30, 0.1, 0.2,  2.0,  40.0, 9.0],   # aggressive
    [4.5,  6.0,  7.5, 1.5, 0.90, 0.1, 0.2,  2.0,  40.0, 9.0],   # cautious
    [1.5,  2.0,  2.5, 1.0, 1.00, 0.1, 0.2,  2.0,  40.0, 3.0],   # slowbrake
    [3.0,  4.5,  2.5, 1.0, 0.50, 0.1, 0.2,  2.0,  20.0, 6.0],   # slow
    [3.0,  4.5,  2.5, 1.0, 0.25, 0.1, 0.15, 2.0,  10.0, 6.0],   # reallyslow
    [4.5,  6.0,  2.5, 1.0, 1.00, 0.1, 0.2,  2.0,  40.0, 9.0],   # normal
], dtype=_np_mod.float64)
IDM_TYPE_PROBS = _np_mod.asarray([0.2, 0.1, 0.1, 0.08, 0.02, 0.5])
_SPEED_LIMIT = 30.0          # every lane in merge.net.xml is speed="30.00"
_IDM_DELTA = 4.0
_CAUTIOUS_IDX = 1


def alternate_flow_probability(cfg: Settings) -> float:
    """Per-tick insertion probability of the alternate flow (reference
    sumo.py:36-44: low -> merge2.rou.xml p=0.3, medium -> merge2b p=0.45,
    high -> merge2c p=0.6)."""
    table = {"low": 0.3, "medium": 0.45, "high": 0.6}
    try:
        return table[cfg.TRAFFIC_DENSITY]
    except KeyError:
        raise ValueError(
            f"Unknown TRAFFIC_DENSITY: {cfg.TRAFFIC_DENSITY}")


class WorldState(NamedTuple):
    """One merge scenario; vmap over a leading batch axis for many."""

    cars_x: jax.Array        # (N,) front-bumper x; _INACTIVE_X when inactive
    cars_v: jax.Array        # (N,)
    cars_prev_v: jax.Array   # (N,) for accel sensing
    cars_active: jax.Array   # (N,) bool
    cars_params: jax.Array   # (N, 6) IDM params [a, b, s0, tau, v0, emerg]
    ego_active: jax.Array    # () bool
    ego_arc: jax.Array       # () route arc position
    ego_v: jax.Array         # ()
    ego_prev_v: jax.Array    # ()
    spawn_delay: jax.Array   # () seconds until next traffic injection
    ego_arrived: jax.Array   # () bool, set the tick the ego exits
    ego_collided: jax.Array  # () bool
    rng: jax.Array           # PRNG key


def init_world(rng, cfg: Settings, dtype=jnp.float32) -> WorldState:
    n = cfg.MAX_CARS
    z = jnp.zeros((), dtype)
    return WorldState(
        cars_x=jnp.full((n,), _INACTIVE_X, dtype),
        cars_v=jnp.zeros((n,), dtype),
        cars_prev_v=jnp.zeros((n,), dtype),
        cars_active=jnp.zeros((n,), bool),
        cars_params=jnp.zeros((n, 6), dtype),
        ego_active=jnp.asarray(False),
        ego_arc=z, ego_v=z, ego_prev_v=z,
        spawn_delay=z,
        ego_arrived=jnp.asarray(False),
        ego_collided=jnp.asarray(False),
        rng=rng)


def _ego_xy(world: WorldState):
    return geometry.route_xy(world.ego_arc)


def _krauss_next_speed(v, gap, leader_v, cfg: Settings, dtype):
    """SUMO Krauss safe-velocity follower (vType params from
    merge_impossible.rou.xml: decel b=6, tau=0.5, accel a=4.5)."""
    b = -cfg.MAX_NEGATIVE_ACCELERATION          # 6.0
    tau = 0.5
    dt = cfg.TICK_LENGTH
    v_safe = -b * tau + jnp.sqrt(
        jnp.maximum(b * b * tau * tau + leader_v * leader_v
                    + 2.0 * b * gap, 0.0))
    v_des = jnp.minimum(
        jnp.minimum(v + cfg.MAX_POSITIVE_ACCELERATION * dt, v_safe),
        jnp.asarray(cfg.OTHER_CAR_SPEED, dtype))
    # physical braking limit: followers cannot exceed their decel rating
    # (vType decel=6; SUMO caps emergency braking near it) — which is what
    # makes collisions *possible* when the ego cuts in too hard
    return jnp.maximum(jnp.maximum(v_des, v - b * dt), 0.0)


def _idm_next_speed(v, net_gap, leader_v, has_leader, params, dt, dtype):
    """IDM follower for the alternate traffic personalities
    (merge2.rou.xml carFollowModel="IDM"; standard IDM with delta=4,
    braking capped at the vType's emergencyDecel)."""
    a = params[:, 0]
    b = params[:, 1]
    s0 = params[:, 2]
    tau = params[:, 3]
    v0 = jnp.maximum(params[:, 4], 0.1)
    emerg = params[:, 5]
    dv = v - leader_v
    s_star = s0 + jnp.maximum(v * tau + v * dv / (2.0 * jnp.sqrt(a * b)),
                              0.0)
    gap = jnp.maximum(net_gap, 0.1)
    interaction = jnp.where(has_leader, (s_star / gap) ** 2, 0.0)
    acc = a * (1.0 - (v / v0) ** _IDM_DELTA - interaction)
    acc = jnp.maximum(acc, -emerg)
    return jnp.maximum(v + acc * dt, 0.0)


def world_step(world: WorldState, ego_speed_command, cfg: Settings
               ) -> WorldState:
    """One simulation tick (reference control.py:215-226 ``step`` +
    SUMO's internal vehicle update), fully vectorized.

    ``ego_speed_command`` is the setSpeed target; pass the current ego
    speed to coast.  Spawning, arrival, and collision flags update in the
    returned state.
    """
    dtype = world.cars_x.dtype
    dt = cfg.TICK_LENGTH
    n = world.cars_x.shape[0]

    ego_x, ego_y = _ego_xy(world)
    # SUMO junction semantics: once the ego has entered the junction's
    # internal merge lane it occupies the conflict area, and highway cars
    # (despite holding the major link, merge.net.xml request "00") brake
    # for the vehicle mapped onto their path — the reference's own
    # disruption record confirms strong yielding (st_default row 18:
    # mean_disruption 0.288, max 6.64, disruption_time 1.36 s; an
    # s>8-threshold yield reproduces almost none of it, mean 0.006).
    ego_on_highway = world.ego_active \
        & (world.ego_arc > geometry.EGO_JUNCTION_ARC)

    # --- traffic: nearest leader ahead among cars (and the merged ego) ---
    x = world.cars_x
    active = world.cars_active
    # pairwise: car j is a candidate leader of car i if ahead and active
    ahead = (x[None, :] > x[:, None]) & active[None, :] & active[:, None]
    cand_x = jnp.where(ahead, x[None, :], jnp.inf)
    leader_idx = jnp.argmin(cand_x, axis=1)
    has_leader = jnp.isfinite(jnp.min(cand_x, axis=1))
    leader_x = jnp.where(has_leader, x[leader_idx], jnp.inf)
    leader_v = jnp.where(has_leader, world.cars_v[leader_idx], 0.0)
    # merged ego splices in if it is the nearest vehicle ahead — AND the
    # follower can actually yield within its braking rating.  SUMO's
    # junction model is gap-acceptance from the major link's side too: a
    # priority vehicle brakes for the merging foe only when stopping
    # behind it is kinematically comfortable; a car already too close /
    # too fast asserts priority and sails past at speed (which is why the
    # reference's waiting ego watches full-speed passes, and why its
    # recorded max follower disruption stays near the 6 m/s^2 decel
    # rating instead of unphysical instant stops).
    b_cap = -cfg.MAX_NEGATIVE_ACCELERATION
    gap_e = ego_x - cfg.CAR_LENGTH - x - 1.0          # bumper gap + minGap
    rel_brake = jnp.maximum(world.cars_v ** 2 - world.ego_v ** 2, 0.0) \
        / (2.0 * b_cap)
    can_yield = (gap_e >= 0.0) & (gap_e >= rel_brake)
    if cfg.DIAG_YIELD_MODE == "always":     # diagnostics (VERDICT r3 #6)
        can_yield = gap_e >= 0.0
    elif cfg.DIAG_YIELD_MODE == "never":
        can_yield = jnp.zeros_like(can_yield)
    ego_between = ego_on_highway & can_yield \
        & (ego_x > x) & (ego_x < leader_x)
    leader_x = jnp.where(ego_between, ego_x, leader_x)
    leader_v = jnp.where(ego_between, world.ego_v, leader_v)

    if cfg.USE_ALTERNATE_TRAFFIC_DISTRIBUTION:
        net_gap = leader_x - cfg.CAR_LENGTH - x      # bumper-to-bumper
        has_lead = jnp.isfinite(leader_x)
        new_cars_v = jnp.where(
            active,
            _idm_next_speed(world.cars_v, net_gap, leader_v, has_lead,
                            world.cars_params, dt, dtype),
            0.0)
    else:
        gap = leader_x - cfg.CAR_LENGTH - x - 1.0   # minGap=1 (rou.xml)
        new_cars_v = jnp.where(
            active,
            _krauss_next_speed(world.cars_v, gap, leader_v, cfg, dtype),
            0.0)
    new_cars_x = jnp.where(active, x + new_cars_v * dt, x)
    # A SUMO follower never passes its leader: a car that yielded to the
    # spliced ego queues behind it rather than creeping past at low
    # speed.  Round-2 lacked this clamp; a follower could inch past a
    # near-stopped ego waiting at the merge, after which the ego pulled
    # out immediately behind it and overtook it again into a grazing
    # side-swipe at the lateral-overlap onset — the entire residual
    # st_default crash rate (dumps r0_0..r3_1).  With the can_yield gate
    # above, every yielding car can comply within the decel rating, so
    # the clamp is a numerical backstop (discrete-step overshoot), never
    # an unphysical instant stop.
    x_floor = x + jnp.maximum(world.cars_v - b_cap * dt, 0.0) * dt
    ego_block = ego_x - cfg.CAR_LENGTH
    blocked = ego_between & (new_cars_x > ego_block)
    if cfg.DIAG_NO_PASS_CLAMP_OFF:          # diagnostics (VERDICT r3 #6)
        blocked = jnp.zeros_like(blocked)
    clamped_x = jnp.maximum(jnp.minimum(new_cars_x, ego_block), x_floor)
    new_cars_x = jnp.where(blocked, clamped_x, new_cars_x)
    new_cars_v = jnp.where(blocked, (new_cars_x - x) / dt, new_cars_v)

    # --- ego: speedMode 22 -> accel/decel limited toward the command ---
    cmd = jnp.asarray(ego_speed_command, dtype)
    lo = world.ego_v + cfg.MAX_NEGATIVE_ACCELERATION * dt
    hi = world.ego_v + cfg.MAX_POSITIVE_ACCELERATION * dt
    new_ego_v = jnp.clip(jnp.clip(cmd, lo, hi), 0.0, 40.0)
    new_ego_v = jnp.where(world.ego_active, new_ego_v, 0.0)
    new_ego_arc = world.ego_arc + new_ego_v * dt

    # --- arrivals / exits ---
    car_exited = active & (new_cars_x >= geometry.TRAFFIC_EXIT_X)
    new_active = active & ~car_exited
    new_cars_x = jnp.where(new_active, new_cars_x, _INACTIVE_X)
    arrived_now = world.ego_active & (new_ego_arc >= geometry.EGO_ARRIVAL_ARC)

    # --- collision (post-move positions, SUMO checks after the step) ---
    # SUMO's junction collision check intersects vehicle *shapes*
    # (collision.check-junctions, ramp.sumocfg): two 1.8 m-wide vehicles
    # (the default width; neither vType overrides it) touch only when
    # their lateral centers are within 1.8 m.  The merging ego converges
    # from the ramp onto the highway lane (y = -1.5) and reaches lateral
    # overlap only past s ~ 24 — pure x-overlap while still laterally
    # offset on the ramp (s in 11..23) is NOT a SUMO collision, and
    # counting it produced phantom "side-swipe" crashes the planner could
    # never see (cars below CRASH_MIN_S - MIN_ALLOWED_DISTANCE don't
    # obstruct the grid, st.py:46-47).  The s > 11 gate mirrors the
    # forecaster's own ego_crash_threshold (prediction.py:12).
    new_ego_x, new_ego_y = geometry.route_xy(new_ego_arc)
    new_ego_s = geometry.get_ego_s(new_ego_x, new_ego_y)
    lateral_overlap = jnp.abs(new_ego_y - geometry.HIGHWAY_Y) < CAR_WIDTH
    overlap = new_active & (jnp.abs(new_cars_x - new_ego_x) < cfg.CAR_LENGTH)
    collided_now = world.ego_active & ~arrived_now \
        & (new_ego_s > EGO_CRASH_THRESHOLD) & lateral_overlap \
        & jnp.any(overlap)

    # --- spawner ---
    rng, k_vary, k_type, k_sf, k_dep = jax.random.split(world.rng, 5)
    free = ~new_active
    slot = jnp.argmax(free)
    # insertion safety: rearmost car must leave room at the entry point
    # (SUMO delays unsafe insertions; with >=1.2 s headways this is rare)
    entry_gap = jnp.min(jnp.where(new_active, new_cars_x, jnp.inf)) \
        - geometry.TRAFFIC_SPAWN_X - cfg.CAR_LENGTH

    if cfg.USE_ALTERNATE_TRAFFIC_DISTRIBUTION:
        # alternate flow: Bernoulli insertion at the route file's
        # probability each tick, vType sampled from the 6-personality
        # distribution (merge2.rou.xml flow probability + vTypeDistribution)
        p_flow = alternate_flow_probability(cfg)
        do_spawn = jax.random.uniform(k_vary, dtype=dtype) < p_flow
        type_idx = jax.random.choice(
            k_type, IDM_TYPE_PROBS.shape[0],
            p=jnp.asarray(IDM_TYPE_PROBS, dtype))
        row = jnp.asarray(IDM_TYPE_TABLE, dtype)[type_idx]
        # speedFactor ~ normc(mean, dev, min, max); SUMO resamples outside
        # the bounds, we clip — within ~2 sigma the difference is tiny
        sf = jnp.clip(row[4] + row[5] * jax.random.normal(k_sf, dtype=dtype),
                      row[6], row[7])
        v_desired = jnp.minimum(sf * _SPEED_LIMIT, row[8])
        params_new = jnp.stack([row[0], row[1], row[2], row[3],
                                v_desired, row[9]])
        # flow departSpeed=10 clamped to the type's desired speed; the
        # cautious personality departs at departSpeed="random"
        spawn_v = jnp.where(
            type_idx == _CAUTIOUS_IDX,
            jax.random.uniform(k_dep, dtype=dtype) * v_desired,
            jnp.minimum(jnp.asarray(10.0, dtype), v_desired))
        can_spawn = do_spawn & jnp.any(free) & (entry_gap > row[2])
        new_delay = world.spawn_delay            # unused by this flow
    else:
        do_spawn = world.spawn_delay <= 0.0
        can_spawn = do_spawn & jnp.any(free) & (entry_gap > 1.0)
        spawn_v = jnp.asarray(cfg.OTHER_CAR_SPEED, dtype)
        params_new = jnp.zeros((6,), dtype)
        vary = jax.random.uniform(k_vary, dtype=dtype) \
            if cfg.VARY_TRAFFIC_START_TIMES else jnp.zeros((), dtype)
        interval = vary + cfg.BASE_TRAFFIC_INTERVAL
        new_delay = jnp.where(do_spawn & can_spawn,
                              interval, world.spawn_delay)
        # an unsafe insertion retries next tick (delay stays <= 0)
        new_delay = jnp.where(do_spawn & ~can_spawn, world.spawn_delay,
                              new_delay) - dt

    # One-hot masked updates, NOT `.at[slot].set(...)` scatters: the TPU
    # backend MISCOMPILES vmapped scatters at large batch (observed: a
    # boolean `a.at[argmax(~a)].set(True)` silently drops individual
    # rows' writes at B >= 1024, tearing the spawn so cars_x/v were
    # written but cars_active was not — the source of the batch-1024
    # eval crash-rate inflation).  A lane-wide select over 48 slots is
    # also the faster formulation on the VPU.
    put = can_spawn & (jnp.arange(n) == slot)
    new_cars_x = jnp.where(put, geometry.TRAFFIC_SPAWN_X, new_cars_x)
    new_cars_v_s = jnp.where(put, spawn_v, new_cars_v)
    prev_v = jnp.where(put, spawn_v, world.cars_v)
    new_params = jnp.where(put[:, None], params_new[None, :],
                           world.cars_params)
    new_active = put | new_active

    return WorldState(
        cars_x=new_cars_x, cars_v=new_cars_v_s, cars_prev_v=prev_v,
        cars_active=new_active, cars_params=new_params,
        ego_active=world.ego_active & ~arrived_now & ~collided_now,
        ego_arc=new_ego_arc, ego_v=new_ego_v, ego_prev_v=world.ego_v,
        spawn_delay=new_delay,
        ego_arrived=arrived_now, ego_collided=collided_now,
        rng=rng)


def add_ego(world: WorldState, start_speed) -> WorldState:
    """Insert the ego at ramp position 40 with the given speed
    (reference control.py:41-44)."""
    dtype = world.cars_x.dtype
    v = jnp.asarray(start_speed, dtype)
    return world._replace(
        ego_active=jnp.asarray(True),
        ego_arc=jnp.asarray(geometry.EGO_DEPART_ARC, dtype),
        ego_v=v, ego_prev_v=v,
        ego_arrived=jnp.asarray(False),
        ego_collided=jnp.asarray(False))


def remove_ego(world: WorldState) -> WorldState:
    return world._replace(ego_active=jnp.asarray(False),
                          ego_arrived=jnp.asarray(False),
                          ego_collided=jnp.asarray(False))


def sense(world: WorldState, cfg: Settings) -> HighwayState:
    """Sensor snapshot -> HighwayState (reference prediction.py:111-142).

    Cars within SENSOR_RADIUS of the ego, front-to-back sorted, padded to
    cfg.MAX_SENSED_CARS slots.  When the ego is absent the reference reports
    it at (-200, 0) with zero speed (prediction.py:121-124).
    """
    dtype = world.cars_x.dtype
    k = cfg.MAX_SENSED_CARS
    dt = cfg.TICK_LENGTH

    ego_x, ego_y = _ego_xy(world)
    ego_x = jnp.where(world.ego_active, ego_x, jnp.asarray(-200.0, dtype))
    ego_y = jnp.where(world.ego_active, ego_y, jnp.zeros((), dtype))
    ego_v = jnp.where(world.ego_active, world.ego_v, 0.0)
    ego_a = jnp.where(world.ego_active,
                      (world.ego_v - world.ego_prev_v) / dt, 0.0)

    dist = jnp.sqrt((world.cars_x - ego_x) ** 2
                    + (geometry.HIGHWAY_Y - ego_y) ** 2)
    visible = world.cars_active & (dist < cfg.SENSOR_RADIUS)
    key_x = jnp.where(visible, world.cars_x, -jnp.inf)
    order = jnp.argsort(-key_x)[:k]
    present = visible[order]
    xs = jnp.where(present, world.cars_x[order], -jnp.inf)
    vs = jnp.where(present, world.cars_v[order], 0.0)
    accs = jnp.where(present,
                     (world.cars_v[order] - world.cars_prev_v[order]) / dt,
                     0.0)
    return HighwayState(ego_x=ego_x, ego_y=ego_y, ego_speed=ego_v,
                        ego_accel=ego_a, other_x=xs, other_speed=vs,
                        other_accel=accs, other_present=present)
