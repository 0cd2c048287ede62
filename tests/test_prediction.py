"""Differential tests for the batched forecaster.

A compact, independent scalar model of the reference forecast semantics
(reference prediction.py:22-105) is implemented here with plain Python
lists; the vectorized jnp implementation must agree to float64 precision on
randomized states.
"""

import functools

import jax
import numpy as np
import pytest

from rl_mpc_lanemerging_tpu import geometry, prediction
from rl_mpc_lanemerging_tpu.config import Settings

CFG = Settings()

# compile once; every trial reuses the same shapes
_step_with_ego = jax.jit(functools.partial(
    prediction.predict_step_with_ego, delta_t=0.3, cfg=CFG))
_step_without_ego = jax.jit(functools.partial(
    prediction.predict_step_without_ego, delta_t=0.3, cfg=CFG))


def scalar_ego_s(x, y):
    if x < -50.9:
        return -np.hypot(x + 50.9, y - 1.72)
    if x < 1.5:
        return np.hypot(x + 50.9, y - 1.72)
    return x - 1.5 + 52.5


def scalar_step_with_ego(ego, cars, sel_speed, dt, min_crash=5.0):
    """Independent scalar transcription of the forecast semantics.

    ego: (x, y, v, a); cars: list of (x, v, a) sorted front-to-back.
    """
    x, y, v, a = ego
    if x < 1.5:
        d = np.array([1.5 - x, -1.5 - y])
        d = d / np.linalg.norm(d) * sel_speed * dt
        px, py = x + d[0], y + d[1]
        py = max(py, -1.6)
    else:
        px, py = x + sel_speed * dt, y
    next_a = (sel_speed - v) / dt
    s = scalar_ego_s(px, py)
    can_crash, merged = s > 11, s > 8

    out, lead = [], (np.inf, 0.0)
    seen = False
    for cx, cv, ca in cars:
        if cx < px and not seen:
            seen = True
            if merged:
                lead = (px, sel_speed)
        dv, dx = lead[0 + 1] - cv, lead[0] - cx
        if dv < 0 and dx < 30:
            na = max(dv, CFG.MAX_PREDICTED_DECELERATION)
            nv = cv + na * dt
        else:
            na, nv = 0.0, cv
        nx = cx + nv * dt
        lead = (nx, nv)
        out.append((nx, nv, na))
    crashed = can_crash and any(
        abs(nx - px) < max(5.0, min_crash) for nx, _, _ in out)
    return (px, py, sel_speed, next_a), out, crashed


def scalar_step_without_ego(ego, cars, dt, min_crash=5.0):
    x, y, v, a = ego
    s = scalar_ego_s(x, y)
    if s < 8 or not cars:
        return scalar_step_with_ego(ego, cars, 0.0, dt, min_crash)
    if cars[0][0] < x:
        return scalar_step_with_ego((-20.0, -10.0, 0.0, 0.0), cars, 0.0, dt,
                                    min_crash)
    last = (0.0, 0.0)
    for cx, cv, _ in cars:
        if cx < x:
            mod = (last[0] - 5.0 - 5.0, y, last[1], 0.0)
            return scalar_step_with_ego(mod, cars, last[1], dt, min_crash)
        last = (cx, cv)
    return scalar_step_with_ego((x, y, last[1], a), cars, last[1], dt,
                                min_crash)


def random_scene(rng, n_cars):
    ego_x = rng.uniform(-210, 60)
    ego_y = float(np.asarray(geometry.route_xy(rng.uniform(40, 300)))[1]) \
        if ego_x < 0 else -1.6
    ego = (ego_x, ego_y, rng.uniform(0, 30), rng.uniform(-6, 4.5))
    xs = np.sort(rng.uniform(-250, 100, n_cars))[::-1]
    cars = [(float(xv), float(rng.uniform(0, 15)), float(rng.uniform(-4, 2)))
            for xv in xs]
    return ego, cars


def to_state(ego, cars):
    return prediction.make_state(
        ego[0], ego[1], ego[2], ego[3],
        [c[0] for c in cars], [c[1] for c in cars], [c[2] for c in cars])


@pytest.mark.parametrize("seed", range(8))
def test_with_ego_matches_scalar(seed):
    rng = np.random.default_rng(seed)
    for trial in range(25):
        ego, cars = random_scene(rng, rng.integers(0, 8))
        sel = float(rng.uniform(0, 30))
        st = to_state(ego, cars)
        nxt, crashed = _step_with_ego(st, sel)
        (px, py, pv, pa), out, ref_crash = scalar_step_with_ego(
            ego, cars, sel, 0.3)
        assert np.isclose(float(nxt.ego_x), px, atol=1e-9)
        assert np.isclose(float(nxt.ego_y), py, atol=1e-9)
        assert np.isclose(float(nxt.ego_accel), pa, atol=1e-9)
        n = len(cars)
        got = np.asarray(nxt.other_x)[:n]
        want = np.array([o[0] for o in out])
        np.testing.assert_allclose(got, want, atol=1e-9)
        got_v = np.asarray(nxt.other_speed)[:n]
        np.testing.assert_allclose(got_v, [o[1] for o in out], atol=1e-9)
        assert bool(crashed) == ref_crash


@pytest.mark.parametrize("seed", range(8))
def test_without_ego_matches_scalar(seed):
    rng = np.random.default_rng(100 + seed)
    for trial in range(25):
        ego, cars = random_scene(rng, rng.integers(0, 8))
        st = to_state(ego, cars)
        nxt, _ = _step_without_ego(st)
        (px, py, _, _), out, _ = scalar_step_without_ego(ego, cars, 0.3)
        n = len(cars)
        np.testing.assert_allclose(
            np.asarray(nxt.other_x)[:n], [o[0] for o in out], atol=1e-9)
        np.testing.assert_allclose(
            np.asarray(nxt.other_speed)[:n], [o[1] for o in out], atol=1e-9)
        assert np.isclose(float(nxt.ego_x), px, atol=1e-9)


def test_closest_cars():
    ego = (-20.0, 0.0, 10.0, 0.0)
    cars = [(30.0, 5.0, 0.0), (-5.0, 6.0, 0.1), (-30.0, 7.0, 0.2),
            (-60.0, 8.0, 0.3)]
    st = to_state(ego, cars)
    front, behind = prediction.get_closest_cars(st)
    assert bool(front[3]) and float(front[0]) == -5.0
    assert bool(behind[3]) and float(behind[0]) == -30.0
    # no cars at all
    front, behind = prediction.get_closest_cars(prediction.empty_state())
    assert not bool(front[3]) and not bool(behind[3])
