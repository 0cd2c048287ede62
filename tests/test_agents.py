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
    control, _, batch_stats = combined_controller(policy, cfg,
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
    control, _, batch_stats = combined_controller(policy, cfg)
    worlds = small_worlds(2, seed=7)
    worlds, stats = run_episode_batch(worlds, cfg, control,
                                      max_episode_length=30.0,
                                      wait_before_start=10.0)
    custom = batch_stats(stats)
    pct = custom["percent st solver"]
    assert pct.shape == (2,)
    assert np.all((pct >= 0) & (pct <= 1))


def test_combined_hysteresis_carry():
    """REMEMBER_LAST_CHOICE_FOR_SWITCHING_COMBINED (reference dqn.py:176):
    after an ST tick, ST keeps control unless RL is strictly better."""
    from rl_mpc_lanemerging_tpu.agents.combined import combined_controller
    cfg = CFG.replace(CRASH_MIN_S=20.0,
                      REMEMBER_LAST_CHOICE_FOR_SWITCHING_COMBINED=True)
    policy = lambda states: jnp.zeros_like(states.ego_speed)
    control, init_carry, batch_stats = combined_controller(policy, cfg)
    assert init_carry is not None
    carry = init_carry(2)
    free = make_state(-150.0, 10.0, 12.0, 0.0, [], [], [],
                      num_slots=cfg.MAX_SENSED_CARS)
    states = jax.tree.map(lambda *xs: jnp.stack(xs), *[free, free])
    (speeds, take), carry2 = control(states, carry)
    assert carry2.shape == (2,)
    assert np.all(np.isfinite(np.asarray(speeds)))

    # on a full-length grid the free-road ST plan accelerates hard: it is
    # jerkier but travels further than the zero-jerk RL rollout.  Fresh
    # comparison -> RL keeps control (ST not better on jerk); sticky
    # comparison (last tick was ST) -> ST keeps control because RL is not
    # strictly better on BOTH criteria (reference dqn.py:176-197).
    cfg_full = cfg.replace(FUTURE_S=150.0)
    control_f, init_carry_f, _ = combined_controller(policy, cfg_full)
    (_, take_fresh), _ = control_f(states, init_carry_f(2))
    (_, take_sticky), _ = control_f(states, jnp.ones((2,), bool))
    assert np.all(np.asarray(take_fresh) == 0.0)
    assert np.all(np.asarray(take_sticky) == 1.0)


def test_stateful_controller_in_episode_loop():
    from rl_mpc_lanemerging_tpu.agents.combined import combined_controller
    cfg = CFG.replace(CRASH_MIN_S=20.0,
                      REMEMBER_LAST_CHOICE_FOR_SWITCHING_COMBINED=True)
    policy = lambda states: jnp.zeros_like(states.ego_speed)
    control, init_carry, batch_stats = combined_controller(policy, cfg)
    worlds = small_worlds(2, seed=9)
    worlds, stats, carry = run_episode_batch(
        worlds, cfg, control, max_episode_length=20.0,
        wait_before_start=10.0, controller_carry=init_carry(2))
    assert carry.shape == (2,)
    pct = batch_stats(stats)["percent st solver"]
    assert np.all((pct >= 0) & (pct <= 1))


def test_dqn_train_driver_small():
    """The C13 task driver: target refresh + periodic eval + checkpoints."""
    import os
    import tempfile
    from rl_mpc_lanemerging_tpu.agents import dqn
    cfg = CFG.replace(NUM_TRAINING_EPISODES=6, TARGET_NET_FREEZE_PERIOD=2,
                      EVALUATION_PERIOD=4, NUM_EVALUATION_EPISODES=2,
                      EVALUATION_EPISODE_LENGTH=10.0, BATCH_SCENARIOS=4,
                      SEED=11, LOG_DIR="test_dqn_driver")
    cwd = os.getcwd()
    with tempfile.TemporaryDirectory() as td:
        os.chdir(td)
        try:
            state = dqn.train(cfg, verbose=False, env_ticks=120)
            assert int(state.episodes) >= 6
            assert os.path.exists("runs/test_dqn_driver/settings.json")
            assert os.path.exists("runs/test_dqn_driver/scalars.csv")
        finally:
            os.chdir(cwd)
