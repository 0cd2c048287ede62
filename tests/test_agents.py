"""Agent trainers and the combined arbiter on tiny shapes."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from rl_mpc_lanemerging_tpu.config import Settings
from rl_mpc_lanemerging_tpu.prediction import make_state
from rl_mpc_lanemerging_tpu.sim import init_world, run_episode_batch

CFG = Settings().replace(MAX_CARS=16, MAX_SENSED_CARS=8,
                         REWARD_FUNCTION="Slotted Jerk",
                         REPLAY_BUFFER_SIZE=2048,
                         # small planner for test speed
                         FUTURE_S=30.0, QP_ITERATIONS=30)


def small_worlds(n=4, seed=0, dtype=jnp.float32):
    keys = jax.random.split(jax.random.PRNGKey(seed), n)
    return jax.vmap(lambda k: init_world(k, CFG, dtype))(keys)


def test_ddpg_round_runs_and_learns():
    from rl_mpc_lanemerging_tpu.agents import ddpg
    state = ddpg.make_train_state(CFG, small_worlds(), jax.random.PRNGKey(0),
                                  wait_before_start=2.0)
    # shrink the warm-start threshold for the test
    old = ddpg.REPLAY_START
    ddpg.REPLAY_START = 32
    try:
        for _ in range(3):
            state = ddpg.train_round(state, CFG, lr=1e-3, env_ticks=30,
                                     wait_before_start=2.0)
    finally:
        ddpg.REPLAY_START = old
    assert int(state.frames) > 0
    for leaf in jax.tree.leaves(state.actor_params):
        assert np.all(np.isfinite(np.asarray(leaf)))
    ctrl = ddpg.actor_controller(state.actor_params, CFG)
    from rl_mpc_lanemerging_tpu.sim import sense_batch
    speeds = np.asarray(ctrl(sense_batch(state.env.world, CFG)))
    assert np.all((speeds >= 0) & (speeds <= CFG.MAX_SPEED))


def test_rainbow_round_runs():
    from rl_mpc_lanemerging_tpu.agents import rainbow
    old = rainbow.REPLAY_START
    rainbow.REPLAY_START = 32
    try:
        state = rainbow.make_train_state(CFG, small_worlds(seed=1),
                                         jax.random.PRNGKey(1),
                                         wait_before_start=2.0)
        for _ in range(3):
            state = rainbow.train_round(state, CFG, lr=1e-3, env_ticks=30,
                                        grad_steps=4,
                                        wait_before_start=2.0)
    finally:
        rainbow.REPLAY_START = old
    for leaf in jax.tree.leaves(state.params):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_path_mean_abs_jerk_matches_scalar():
    from rl_mpc_lanemerging_tpu.agents.combined import path_mean_abs_jerk
    rng = np.random.default_rng(0)
    seq = np.cumsum(rng.uniform(0, 3, 8))
    v0, a0, dt = 5.0, 1.0, 0.2
    # independent scalar computation (reference st.py:274-288 semantics)
    prev_v, prev_a, total = v0, a0, 0.0
    for i in range(1, len(seq)):
        v = (seq[i] - seq[i - 1]) / dt
        a = (v - prev_v) / dt
        j = (a - prev_a) / dt
        prev_v, prev_a = v, a
        total += abs(j)
    expected = total / (len(seq) - 1)
    got = float(path_mean_abs_jerk(jnp.asarray(seq), jnp.asarray(8),
                                   jnp.asarray(v0), jnp.asarray(a0), dt))
    assert np.isclose(got, expected, rtol=1e-6)


def test_combined_controller_gates():
    from rl_mpc_lanemerging_tpu.agents.combined import combined_controller
    cfg = CFG.replace(CRASH_MIN_S=20.0)

    # a constant moderate-jerk policy
    policy = lambda states: jnp.full_like(states.ego_speed, 0.5)
    control, batch_stats = combined_controller(policy, cfg,
                                               dtype=jnp.float64)

    def batch_of(states_list):
        return jax.tree.map(lambda *xs: jnp.stack(xs), *states_list)

    free = make_state(-150.0, 10.0, 12.0, 0.0, [], [], [],
                      num_slots=cfg.MAX_SENSED_CARS)
    # ego merged, running into a stopped car just ahead -> rollout crash
    doomed = make_state(-10.0, -1.6, 12.0, 0.0, [-4.0], [0.0], [0.0],
                        num_slots=cfg.MAX_SENSED_CARS)
    states = batch_of([free, doomed])
    speeds, takeover = control(states)
    speeds = np.asarray(speeds)
    takeover = np.asarray(takeover)
    assert takeover[1] == 1.0, "rollout crash must trigger ST takeover"
    assert np.all(np.isfinite(speeds))
    # free-road RL action: jerk 0.5 -> small acceleration
    expected_free_rl = min(12.0 + (0.0 + 0.5 * 0.2) * 0.2, 30.0)
    if takeover[0] == 0.0:
        assert np.isclose(speeds[0], expected_free_rl, atol=1e-6)


def test_combined_in_episode_loop():
    from rl_mpc_lanemerging_tpu.agents.combined import combined_controller
    cfg = CFG.replace(CRASH_MIN_S=20.0)
    policy = lambda states: jnp.zeros_like(states.ego_speed)
    control, batch_stats = combined_controller(policy, cfg)
    worlds = small_worlds(2, seed=7)
    worlds, stats = run_episode_batch(worlds, cfg, control,
                                      max_episode_length=30.0,
                                      wait_before_start=10.0)
    custom = batch_stats(stats)
    pct = custom["percent st solver"]
    assert pct.shape == (2,)
    assert np.all((pct >= 0) & (pct <= 1))
