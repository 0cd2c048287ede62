"""Differential tests: dense-DP device solver vs the native heap oracle.

Both solvers run on the same randomized lattices; on CPU with float64 the
dense DP performs the same double-precision operations in the same
association order as the oracle, so agreement should be essentially exact
(well below the 1e-3 acceptance bound from BASELINE.md).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from rl_mpc_lanemerging_tpu.config import Settings
from rl_mpc_lanemerging_tpu.ops import oracle, st_dp

CFG = Settings()


def weights(cfg=CFG):
    return st_dp.STWeights(
        d_weight=cfg.D_WEIGHT, v_weight=cfg.V_WEIGHT, a_weight=cfg.A_WEIGHT,
        j_weight=cfg.J_WEIGHT, desired_speed=cfg.DESIRED_SPEED,
        max_speed=cfg.MAX_SPEED,
        negative_acceleration_limit=cfg.MAX_NEGATIVE_ACCELERATION,
        positive_acceleration_limit=cfg.MAX_POSITIVE_ACCELERATION,
        negative_jerk_limit=cfg.MINIMUM_NEGATIVE_JERK,
        positive_jerk_limit=cfg.MAXIMUM_POSITIVE_JERK,
        min_allowed_distance=cfg.MIN_ALLOWED_DISTANCE)


def random_lattice(rng, num_t=10, num_s=401, delta_s=0.05, delta_t=0.3,
                   obstacle_blocks=3):
    start_s = float(rng.uniform(-200, 20))
    s_values = start_s + np.arange(num_s) * delta_s
    t_values = np.arange(num_t) * delta_t
    obstacles = np.zeros((num_t, num_s), dtype=bool)
    distances = np.full((num_t, num_s), 1e10)
    for _ in range(obstacle_blocks):
        # a moving obstacle band, like a projected car
        pos = rng.uniform(0, num_s)
        vel = rng.uniform(-40, 40)  # cells per time step
        half = int(rng.integers(40, 120))
        for t in range(num_t):
            c = int(pos + vel * t)
            lo, hi = max(c - half, 0), min(c + half, num_s)
            if lo < num_s and hi > 0:
                obstacles[t, lo:hi] = True
            dist_to = np.minimum(np.abs(np.arange(num_s) - (c - half)),
                                 np.abs(np.arange(num_s) - (c + half)))
            distances[t] = np.minimum(distances[t], dist_to * delta_s)
        distances[obstacles] = 0.0
    obstacles[:, 0] = False  # keep the start cell open
    return obstacles, s_values, t_values, distances


@pytest.mark.parametrize("seed", range(10))
def test_jerk_solver_matches_oracle_random(seed):
    rng = np.random.default_rng(seed)
    obstacles, s_values, t_values, distances = random_lattice(rng)
    v0 = float(rng.uniform(0, 25))
    a0 = float(rng.uniform(-6, 4.5))
    w = weights()

    ref = oracle.solve_fast(
        obstacles, s_values, t_values, v0, a0, distances,
        w.d_weight, w.v_weight, w.a_weight, w.j_weight, w.desired_speed,
        w.max_speed, w.negative_acceleration_limit,
        w.positive_acceleration_limit, w.negative_jerk_limit,
        w.positive_jerk_limit, w.min_allowed_distance)

    max_off = st_dp.default_max_offset(w.max_speed, 0.3, 0.05)
    got = st_dp.solve_st_fast(
        jnp.asarray(obstacles), jnp.asarray(s_values),
        jnp.asarray(t_values), jnp.asarray(v0), jnp.asarray(a0),
        jnp.asarray(distances), w, max_off)
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-9,
                               err_msg=f"seed={seed}")


@pytest.mark.parametrize("seed", range(6))
def test_no_jerk_solver_matches_oracle_random(seed):
    rng = np.random.default_rng(1000 + seed)
    obstacles, s_values, t_values, distances = random_lattice(rng)
    v0 = float(rng.uniform(0, 25))
    w = weights()

    ref = oracle.solve_no_jerk_fast(
        obstacles, s_values, t_values, v0, distances,
        w.d_weight, w.v_weight, w.a_weight, w.desired_speed, w.max_speed,
        w.negative_acceleration_limit, w.positive_acceleration_limit,
        w.min_allowed_distance)

    max_off = st_dp.default_max_offset(w.max_speed, 0.3, 0.05)
    got = st_dp.solve_st_no_jerk_fast(
        jnp.asarray(obstacles), jnp.asarray(s_values),
        jnp.asarray(t_values), jnp.asarray(v0), jnp.asarray(distances),
        w, max_off)
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-9,
                               err_msg=f"seed={seed}")


def test_free_road_accelerates_toward_desired_speed():
    num_t, num_s = 18, 3001
    s_values = -150.0 + np.arange(num_s) * 0.05
    t_values = np.arange(num_t) * 0.3
    obstacles = np.zeros((num_t, num_s), dtype=bool)
    distances = np.full((num_t, num_s), 1e10)
    w = weights()
    max_off = st_dp.default_max_offset(w.max_speed, 0.3, 0.05)
    seq = np.asarray(st_dp.solve_st_fast(
        jnp.asarray(obstacles), jnp.asarray(s_values), jnp.asarray(t_values),
        jnp.asarray(10.0), jnp.asarray(0.0), jnp.asarray(distances),
        w, max_off))
    v = np.diff(seq) / 0.3
    assert np.all(np.diff(v) > -1e-6)       # monotone speed-up, no braking
    assert v[-1] > 15.0                     # meaningfully above start speed
    assert np.all(v <= w.max_speed + 1e-6)


def test_fully_blocked_future_returns_trimmed_path():
    num_t, num_s = 10, 401
    s_values = np.arange(num_s) * 0.05
    t_values = np.arange(num_t) * 0.3
    obstacles = np.zeros((num_t, num_s), dtype=bool)
    obstacles[5:, :] = True  # nothing reachable from t=5 on
    distances = np.full((num_t, num_s), 1e10)
    distances[obstacles] = 0.0
    w = weights()
    max_off = st_dp.default_max_offset(w.max_speed, 0.3, 0.05)
    seq = np.asarray(st_dp.solve_st_fast(
        jnp.asarray(obstacles), jnp.asarray(s_values), jnp.asarray(t_values),
        jnp.asarray(5.0), jnp.asarray(0.0), jnp.asarray(distances),
        w, max_off))
    assert np.all(seq[5:] == 0.0)           # zero-filled past best layer
    assert np.any(seq[1:5] > 0.0)
