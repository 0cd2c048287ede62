"""Behavioral tests for the vectorized merge world."""

import jax
import jax.numpy as jnp
import numpy as np

from rl_mpc_lanemerging_tpu.config import Settings
from rl_mpc_lanemerging_tpu import geometry
from rl_mpc_lanemerging_tpu.sim import (init_world, run_episode_batch,
                                        sense_batch, warmup)

CFG = Settings().replace(MAX_CARS=48, MAX_SENSED_CARS=32)
DTYPE = jnp.float64


def make_worlds(batch, seed=0):
    keys = jax.random.split(jax.random.PRNGKey(seed), batch)
    return jax.vmap(lambda k: init_world(k, CFG, DTYPE))(keys)


def test_warmup_reaches_traffic_steady_state():
    w = make_worlds(4)
    w = warmup(w, CFG, int(50.0 / CFG.TICK_LENGTH))
    active = np.asarray(w.cars_active)
    counts = active.sum(axis=1)
    # 50 s of spawning at ~1.7 s headway -> ~29 cars, none exited yet
    assert np.all(counts >= 20) and np.all(counts <= 40)
    v = np.asarray(w.cars_v)
    assert np.all(np.abs(v[active] - CFG.OTHER_CAR_SPEED) < 1e-6)
    # spacing: front-bumper gaps at least car length + minGap
    for b in range(4):
        xs = np.sort(np.asarray(w.cars_x[b])[active[b]])
        if len(xs) > 1:
            assert np.min(np.diff(xs)) > CFG.CAR_LENGTH + 0.9


def test_traffic_flows_through_network():
    w = make_worlds(2)
    w = warmup(w, CFG, int(120.0 / CFG.TICK_LENGTH))
    active = np.asarray(w.cars_active)
    xs = np.asarray(w.cars_x)
    # after 120 s the earliest cars must have exited at x=100 and slots
    # must be recycled (count stays bounded)
    assert np.all(active.sum(axis=1) <= CFG.MAX_CARS)
    assert np.all(xs[active] < geometry.TRAFFIC_EXIT_X)


def test_episode_terminates_and_flags_are_consistent():
    w = make_worlds(8)
    controller = lambda state: jnp.full_like(state.ego_speed, 7.0)
    w, stats = run_episode_batch(w, CFG, controller,
                                 max_episode_length=100.0,
                                 wait_before_start=50.0)
    crashed = np.asarray(stats.crashed)
    merged = np.asarray(stats.merged)
    assert not np.any(crashed & merged)
    assert np.all(np.asarray(stats.ticks) > 0)
    # at traffic speed the ego should usually survive to merge or time out
    assert np.all(np.asarray(stats.max_speed) <= 40.0)


def test_full_throttle_ego_mostly_crashes_into_dense_traffic():
    w = make_worlds(8, seed=3)
    controller = lambda state: jnp.full_like(state.ego_speed, 30.0)
    w, stats = run_episode_batch(w, CFG, controller)
    # blasting into 7 m/s traffic without planning must crash sometimes
    assert np.asarray(stats.crashed).sum() >= 4


def test_world_is_deterministic():
    w1 = make_worlds(2, seed=42)
    w2 = make_worlds(2, seed=42)
    controller = lambda state: jnp.full_like(state.ego_speed, 10.0)
    _, s1 = run_episode_batch(w1, CFG, controller)
    _, s2 = run_episode_batch(w2, CFG, controller)
    for a, b in zip(s1, s2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sense_orders_cars_front_to_back():
    w = make_worlds(2)
    w = warmup(w, CFG, 200)
    state = sense_batch(w, CFG)
    xs = np.asarray(state.other_x)
    present = np.asarray(state.other_present)
    for b in range(2):
        vals = xs[b][present[b]]
        assert np.all(np.diff(vals) <= 0)  # descending


def test_collision_requires_lateral_overlap():
    """SUMO intersects vehicle *shapes*: an ego still laterally offset on
    the ramp (s ~ 12, y ~ 1.0, lateral gap > 1.8 m to the highway lane)
    passing a slower car is NOT a collision; actual x-overlap once merged
    (lateral centers within the 1.8 m default width) IS."""
    from rl_mpc_lanemerging_tpu.sim.world import world_step

    w = make_worlds(1)
    w0 = jax.tree.map(lambda x: x[0], w)

    def place(arc, car_x, ego_v=12.0, car_v=7.0):
        ww = w0._replace(
            ego_active=jnp.asarray(True),
            ego_arc=jnp.asarray(arc, DTYPE),
            ego_v=jnp.asarray(ego_v, DTYPE),
            ego_prev_v=jnp.asarray(ego_v, DTYPE),
            cars_x=w0.cars_x.at[0].set(car_x),
            cars_v=w0.cars_v.at[0].set(car_v),
            cars_active=w0.cars_active.at[0].set(True))
        return world_step(ww, jnp.asarray(ego_v, DTYPE), CFG)

    # ego at s ~ 12 (still on the ramp, y ~ 1.0): same x as a car -> no crash
    ego_x, ego_y = map(float, geometry.route_xy(jnp.asarray(213.6, DTYPE)))
    s = float(geometry.get_ego_s(jnp.asarray(ego_x), jnp.asarray(ego_y)))
    assert 11.5 < s < 14.0 and abs(ego_y - geometry.HIGHWAY_Y) > 1.8
    w_after = place(213.6, ego_x)
    assert not bool(w_after.ego_collided)

    # ego at s ~ 40 (y within 1.8 of the lane): same x -> crash
    ego_x2, ego_y2 = map(float, geometry.route_xy(jnp.asarray(242.0, DTYPE)))
    s2 = float(geometry.get_ego_s(jnp.asarray(ego_x2), jnp.asarray(ego_y2)))
    assert s2 > 35.0 and abs(ego_y2 - geometry.HIGHWAY_Y) < 1.8
    w_after2 = place(242.0, ego_x2)
    assert bool(w_after2.ego_collided)


def test_spawner_batch_size_invariance():
    """The spawner must be bitwise identical for a given scenario
    regardless of the compiled batch shape.  Round-4 regression: the TPU
    backend miscompiled the vmapped `.at[slot].set()` spawn scatters at
    batch >= 1024, silently dropping individual rows' active-flag writes
    (torn spawns) and inflating fast-traffic eval crash rates 10-45x; the
    spawner now uses one-hot masked selects (world.py).  This exercises
    the prefix-stable key property on CPU; the TPU repro lives in
    scripts/probe_batch1024.py."""
    cfg = CFG.replace(OTHER_CAR_SPEED=15.0, BASE_TRAFFIC_INTERVAL=1.2)
    keys = jax.random.split(jax.random.PRNGKey(0), 256)
    worlds = jax.vmap(lambda k: init_world(k, cfg, DTYPE))(keys)
    small = jax.tree.map(lambda x: x[:64], worlds)
    w_big = warmup(worlds, cfg, 300)
    w_small = warmup(small, cfg, 300)
    for f in w_big._fields:
        a = np.asarray(getattr(w_small, f))
        b = np.asarray(getattr(w_big, f))[:64]
        np.testing.assert_array_equal(a, b, err_msg=f)
