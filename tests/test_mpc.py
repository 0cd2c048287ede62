"""End-to-end MPC controller tests: grid -> DP -> QP -> command -> sim."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from rl_mpc_lanemerging_tpu.config import Settings
from rl_mpc_lanemerging_tpu.planner import mpc
from rl_mpc_lanemerging_tpu.planner.grid import build_st_grid
from rl_mpc_lanemerging_tpu.prediction import make_state
from rl_mpc_lanemerging_tpu.sim import init_world, run_episode_batch

# st_default experiment settings (configs/st_default.json)
CFG = Settings().replace(CRASH_MIN_S=20.0, MAX_CARS=48, MAX_SENSED_CARS=32)
DTYPE = jnp.float64


def test_grid_free_road_has_no_obstacles():
    state = make_state(-150.0, 10.0, 12.0, 0.0, [], [], [])
    grid = build_st_grid(state, CFG, dtype=DTYPE)
    assert not bool(jnp.any(grid.obstacles))
    assert float(jnp.min(grid.distances)) > 1e9
    assert grid.obstacles.shape == (CFG.num_t, CFG.num_s)


def test_grid_marks_blocking_car():
    # ego approaching merge, a slow car just past the merge point
    state = make_state(-60.0, 2.6, 10.0, 0.0, [-20.0], [3.0], [0.0])
    grid = build_st_grid(state, CFG, dtype=DTYPE)
    obst = np.asarray(grid.obstacles)
    assert obst[0].any()
    # obstacle band must track the car's predicted forward motion
    first_t0 = np.argmax(obst[0])
    first_t5 = np.argmax(obst[5])
    assert first_t5 > first_t0


@functools.partial(jax.jit, static_argnames=("cfg",))
def _control(state, cfg):
    return mpc.st_control_speed(state, cfg, DTYPE)[0]


def test_free_road_controller_accelerates():
    state = make_state(-150.0, 10.0, 12.0, 0.0, [], [], [])
    speed = float(_control(state, CFG))
    # desired speed is 30; one coarse step up from 12 m/s
    assert speed > 12.0
    assert speed <= 12.0 + 4.6 * CFG.TICK_LENGTH + 1e-6 or speed > 12.0


def test_guaranteed_crash_detection():
    free = make_state(-150.0, 10.0, 12.0, 0.0, [], [], [])
    f = jax.jit(functools.partial(mpc.test_guaranteed_crash, cfg=CFG,
                                  dtype=DTYPE))
    assert not bool(f(free))
    # ego merged at speed, box of stopped cars immediately ahead & behind
    boxed = make_state(-20.0, -1.6, 12.0, 0.0,
                       [-14.0, -26.0], [0.0, 12.0], [0.0, 0.0])
    assert bool(f(boxed))


def test_mpc_episode_merges_without_crash():
    cfg = CFG.replace(MAX_CARS=48)
    keys = jax.random.split(jax.random.PRNGKey(11), 4)
    worlds = jax.vmap(lambda k: init_world(k, cfg, DTYPE))(keys)

    controller = functools.partial(mpc.batched_controller, cfg=cfg)
    worlds, stats = run_episode_batch(worlds, cfg, controller,
                                      max_episode_length=100.0,
                                      wait_before_start=50.0)
    crashed = np.asarray(stats.crashed)
    merged = np.asarray(stats.merged)
    assert crashed.sum() == 0, "MPC must not crash"
    assert merged.sum() >= 3, f"expected merges, got {merged}"
