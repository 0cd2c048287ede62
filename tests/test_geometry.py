import numpy as np
import jax.numpy as jnp

from rl_mpc_lanemerging_tpu import geometry


def test_ego_s_piecewise():
    # before the merge: negative distance to merge point
    s = geometry.get_ego_s(-100.0, 10.0)
    expected = -np.hypot(-100.0 - (-50.9), 10.0 - 1.72)
    assert np.isclose(float(s), expected)
    # between merge points: positive distance
    s = geometry.get_ego_s(-20.0, 0.0)
    expected = np.hypot(-20.0 - (-50.9), 0.0 - 1.72)
    assert np.isclose(float(s), expected)
    # after the junction: linear in x with the common offset
    s = geometry.get_ego_s(10.0, -1.6)
    assert np.isclose(float(s), 10.0 - 1.5 + 52.5)


def test_ego_s_continuity_at_junction_exit():
    # the reference map itself has a ~1.1 mm seam here; just check it's tiny
    eps = 1e-5
    s_before = float(geometry.get_ego_s(1.5 - eps, -1.5))
    s_after = float(geometry.get_ego_s(1.5 + eps, -1.5))
    assert abs(s_before - s_after) < 5e-3


def test_obstacle_s():
    assert float(geometry.get_obstacle_s_from_x(-51.0)) == 0.0
    assert float(geometry.get_obstacle_s_from_x(0.0)) == 51.0


def test_route_xy_endpoints():
    x, y = np.asarray(geometry.route_xy(0.0))
    assert np.isclose(x, -250.47, atol=0.02)
    # end of ramp is near the merge point
    x, y = np.asarray(geometry.route_xy(201.9))
    assert np.isclose(x, -50.58, atol=0.05)
    assert np.isclose(y, 1.71, atol=0.05)
    # far end of route on the highway lane
    x, y = np.asarray(geometry.route_xy(geometry.route_arc_total()))
    assert np.isclose(x, 100.0, atol=0.01)
    assert np.isclose(y, -1.6, atol=0.01)


def test_route_xy_batched():
    arcs = jnp.linspace(0.0, geometry.route_arc_total(), 64)
    xy = np.asarray(geometry.route_xy(arcs))
    assert xy.shape == (64, 2)
    assert np.all(np.diff(xy[:, 0]) > -1e-9)  # x monotonically increases
