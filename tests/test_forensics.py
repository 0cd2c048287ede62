"""Crash-forensics tests: capture -> dump -> offline replay + plots
(reference stats.py:75-77 crash pickling, st.py:827-859 replay/plot)."""

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np

from rl_mpc_lanemerging_tpu import forensics, tasks
from rl_mpc_lanemerging_tpu.config import Settings
from rl_mpc_lanemerging_tpu.sim import init_world
from rl_mpc_lanemerging_tpu.sim.episode import run_episode_batch

CFG = Settings().replace(FUTURE_S=3.0, FUTURE_T=1.5, MAX_CARS=16,
                         MAX_SENSED_CARS=8, QP_ITERATIONS=5,
                         BATCH_SCENARIOS=8, SEED=3,
                         BASE_TRAFFIC_INTERVAL=1.2, OTHER_CAR_SPEED=7.0)


def _ram_controller(states):
    """Floor it: guarantees collisions in dense traffic."""
    return jnp.full_like(states.ego_speed, 30.0)


def _crashing_run():
    keys = jax.random.split(jax.random.PRNGKey(CFG.SEED), 8)
    worlds = jax.vmap(lambda k: init_world(k, CFG, jnp.float32))(keys)
    return run_episode_batch(worlds, CFG, _ram_controller,
                             max_episode_length=40.0,
                             wait_before_start=30.0, record_history=True)


def test_history_capture_and_dump(tmp_path):
    _, stats, history = _crashing_run()
    crashed = np.asarray(stats.crashed)
    assert crashed.any(), "ram controller should crash in dense traffic"

    histories = forensics.extract_crash_histories(stats, history)
    assert len(histories) == int(crashed.sum())
    ticks = np.asarray(stats.ticks)[crashed]
    for states, n in zip(histories, ticks):
        assert len(states) == int(n)
        # ego positions should be finite and advance monotonically
        xs = np.asarray([float(s.ego_x) for s in states])
        assert np.all(np.isfinite(xs))
        assert xs[-1] >= xs[0]

    paths = forensics.dump_crashes(stats, history, run_dir=str(tmp_path))
    assert len(paths) == len(histories)
    assert all(os.path.exists(p) for p in paths)


def test_replay_crash_resolves_and_plots(tmp_path):
    _, stats, history = _crashing_run()
    paths = forensics.dump_crashes(stats, history, run_dir=str(tmp_path))
    doomed, plots = forensics.replay_crash(paths[0], CFG,
                                           out_dir=str(tmp_path))
    states = forensics.load_crash(paths[0])
    assert len(doomed) == len(states)
    pngs = glob.glob(os.path.join(str(tmp_path), "crash_*.png"))
    assert len(pngs) == len(states)


def test_evaluate_controller_dumps_on_crash(tmp_path):
    agg = tasks.evaluate_controller(
        CFG, _ram_controller, num_episodes=8, batch=8,
        max_episode_length=40.0, wait_before_start=30.0, verbose=False,
        mesh=None, save_state_on_crash=True, run_dir=str(tmp_path))
    assert np.mean(agg.columns["crashed"]) > 0
    assert glob.glob(os.path.join(str(tmp_path),
                                  "crashed_state_history_*.pkl"))
