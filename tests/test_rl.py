"""RL stack tests: observations, rewards, replay, env, DQN round."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from rl_mpc_lanemerging_tpu.config import Settings
from rl_mpc_lanemerging_tpu.envs.merge_env import (EnvKind, env_reset,
                                                   env_step)
from rl_mpc_lanemerging_tpu.prediction import make_state, empty_state
from rl_mpc_lanemerging_tpu.rl import replay as rb
from rl_mpc_lanemerging_tpu.rl.obs import state_vector
from rl_mpc_lanemerging_tpu.rl.rewards import (continuous_reward,
                                               get_reward_function,
                                               slotted_reward_with_jerk,
                                               st_reward)
from rl_mpc_lanemerging_tpu.sim import init_world

CFG = Settings()


def test_state_vector_layout():
    st = make_state(-20.0, 0.0, 10.0, 1.0,
                    [-5.0, 30.0, -30.0], [6.0, 5.0, 7.0], [0.1, 0.2, 0.3])
    v = np.asarray(state_vector(st, CFG))
    assert v.shape == (20,)
    # front_1 = nearest ahead = x=-5 car: [acc/9, (v-v_ego)/30, dx/125, 1]
    np.testing.assert_allclose(v[0:4],
                               [0.1 / 9, (6 - 10) / 30, 15 / 125, 1],
                               atol=1e-6)
    # front_2 = x=30 car
    np.testing.assert_allclose(v[4:8],
                               [0.2 / 9, (5 - 10) / 30, 50 / 125, 1],
                               atol=1e-6)
    # back_1 = x=-30 car
    np.testing.assert_allclose(v[8:12],
                               [0.3 / 9, (7 - 10) / 30, -10 / 125, 1],
                               atol=1e-6)
    # back_2 absent
    np.testing.assert_allclose(v[12:16], 0.0, atol=1e-9)
    # ego block
    np.testing.assert_allclose(v[16:20],
                               [10 / 30, 1 / 9, -20 / 300, 0.0], atol=1e-6)


def test_rewards_terminal_and_live():
    st = empty_state()
    cfg = CFG.replace(REWARD_FUNCTION="Slotted Jerk", ALT_J_WEIGHT=0.1)
    f = get_reward_function(cfg)
    assert float(f(st, 0.0, jnp.asarray(True), jnp.asarray(False),
                   cfg)) == cfg.CRASH_REWARD
    assert float(f(st, 0.0, jnp.asarray(False), jnp.asarray(True),
                   cfg)) == cfg.SUCCESS_REWARD
    live = float(f(st, 2.0, jnp.asarray(False), jnp.asarray(False), cfg))
    assert np.isclose(live, -0.1 * 0.2 - 0.1 * 4.0 * 0.2)

    # continuous reward penalizes small gaps
    near = make_state(-20.0, -1.6, 10.0, 0.0, [-13.0], [7.0], [0.0])
    far = make_state(-20.0, -1.6, 10.0, 0.0, [-60.0], [7.0], [0.0])
    r_near = float(continuous_reward(near, 0.0, False, False, CFG))
    r_far = float(continuous_reward(far, 0.0, False, False, CFG))
    assert r_near < r_far

    r_st = float(st_reward(near, 1.0, False, False, CFG))
    assert np.isfinite(r_st) and r_st < 0


def test_replay_ring_and_prioritized_sampling():
    cfg = CFG
    r = rb.init_replay(64, 4, discrete=True)
    assert r.priority.shape[0] == 64
    key = jax.random.PRNGKey(0)
    obs = jnp.arange(40.0).reshape(10, 4)
    acts = jnp.arange(10, dtype=jnp.int32)
    valid = jnp.ones(10, bool).at[3].set(False)  # one masked row
    r = rb.add_batch(r, obs, obs + 1, acts, jnp.ones(10),
                     jnp.zeros(10, bool), valid, 2.0)
    assert int(r.size) == 9
    assert int(r.pos) == 9
    # masked row (action 3) must not be stored
    stored = np.asarray(r.action[:9])
    assert 3 not in stored

    # prioritized sampling concentrates on the high-priority item
    r = rb.update_priorities(r, jnp.asarray([0]), jnp.asarray([1000.0]),
                             cfg)
    idx, batch = rb.sample(r, key, 256)
    frac0 = float(np.mean(np.asarray(idx) == 0))
    # item 0 has priority 2 (=max^alpha), others 2 as well -> after the
    # update item 0 keeps clipped max priority; check distribution sane
    assert 0.0 < frac0 < 1.0
    # now zero out everything except item 5
    r = r._replace(priority=jnp.zeros(64).at[5].set(1.0))
    idx, _ = rb.sample(r, key, 128)
    assert np.all(np.asarray(idx) == 5)


def test_env_step_runs_and_resets():
    cfg = CFG.replace(MAX_CARS=16, MAX_SENSED_CARS=8,
                      REWARD_FUNCTION="Slotted Jerk")
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    world = jax.vmap(lambda k: init_world(k, cfg, jnp.float64))(keys)
    env = env_reset(world, cfg, wait_before_start=2.0)
    total_valid = 0
    for i in range(30):
        actions = jnp.full((4,), 2, jnp.int32)  # zero jerk
        env, tr = env_step(env, actions, cfg, EnvKind.JERK,
                           max_episode_length=3.0, wait_before_start=2.0)
        total_valid += int(np.sum(np.asarray(tr["valid"])))
    # warmup = 10 ticks, episodes cap at 15 ticks -> multiple episodes ran
    assert total_valid > 4 * 10
    assert env.obs.shape == (4, cfg.obs_dim)


def test_dqn_train_round_improves_nothing_but_runs():
    from rl_mpc_lanemerging_tpu.agents import dqn as dqn_agent
    cfg = CFG.replace(MAX_CARS=16, MAX_SENSED_CARS=8,
                      REWARD_FUNCTION="Slotted Jerk",
                      REPLAY_BUFFER_SIZE=2048, BATCH_SIZE=32,
                      TRAINING_EPISODE_LENGTH=5.0)
    keys = jax.random.split(jax.random.PRNGKey(1), 4)
    world = jax.vmap(lambda k: init_world(k, cfg, jnp.float32))(keys)
    state = dqn_agent.make_train_state(cfg, world, jax.random.PRNGKey(2), wait_before_start=2.0)
    for _ in range(2):
        state = dqn_agent.train_round(state, cfg, env_ticks=40,
                                      grad_steps=4, wait_before_start=2.0)
    assert int(state.replay.size) > 0
    assert np.isfinite(float(state.loss_sum))
    # params changed
    leaf0 = jax.tree.leaves(state.params)[0]
    assert np.all(np.isfinite(np.asarray(leaf0)))
    ctrl = dqn_agent.greedy_controller(state.params, cfg)
    from rl_mpc_lanemerging_tpu.sim import sense_batch
    speeds = ctrl(sense_batch(state.env.world, cfg))
    assert speeds.shape == (4,)


def test_acceleration_env_semantics():
    """EnvKind.ACCELERATION (reference merge_gym.py:187-213 AccelerationEnv):
    actions index ACCELERATION_VALUES_DQN; projected-jerk violations clamp
    through the jerk path and pay the invalid-action penalty."""
    cfg = CFG.replace(MAX_CARS=16, MAX_SENSED_CARS=8,
                      REWARD_FUNCTION="Slotted Jerk")
    keys = jax.random.split(jax.random.PRNGKey(7), 4)
    world = jax.vmap(lambda k: init_world(k, cfg, jnp.float64))(keys)
    env = env_reset(world, cfg, wait_before_start=2.0)
    n_act = len(cfg.ACCELERATION_VALUES_DQN)
    total_valid = 0
    rewards = []
    for i in range(30):
        actions = jnp.full((4,), i % n_act, jnp.int32)
        env, tr = env_step(env, actions, cfg, EnvKind.ACCELERATION,
                           max_episode_length=3.0, wait_before_start=2.0)
        total_valid += int(np.sum(np.asarray(tr["valid"])))
        rewards.append(np.asarray(tr["reward"]))
    assert total_valid > 4 * 10
    assert env.obs.shape == (4, cfg.obs_dim)
    assert np.all(np.isfinite(np.stack(rewards)))

    # a max-acceleration demand from rest violates the jerk limit ->
    # the executed acceleration is jerk-clamped, not the table value
    env2 = env_reset(world, cfg, wait_before_start=0.0)
    a_max_idx = int(np.argmax(np.asarray(cfg.ACCELERATION_VALUES_DQN)))
    v0 = np.asarray(env2.state.ego_speed)
    env2, tr2 = env_step(env2, jnp.full((4,), a_max_idx, jnp.int32), cfg,
                         EnvKind.ACCELERATION, max_episode_length=3.0,
                         wait_before_start=0.0)
    v1 = np.asarray(env2.state.ego_speed)
    active = np.asarray(tr2["valid"])
    jerk_cap_dv = (cfg.MAXIMUM_POSITIVE_JERK * cfg.TICK_LENGTH
                   + 1e-6) * cfg.TICK_LENGTH
    assert np.all((v1 - v0)[active] <= jerk_cap_dv + 1e-6)


def test_batched_conditional_st():
    """do_conditional_st_based_on_first_step (reference st.py:805-814):
    safe proposals pass through; proposals whose one-step prediction
    crashes hand control to the ST solver."""
    from rl_mpc_lanemerging_tpu.planner import mpc
    from rl_mpc_lanemerging_tpu.prediction import make_state

    cfg = CFG
    # ego merged at s ~ 30, leader 6 m ahead at 7 m/s: proposing 30 m/s
    # predicts a crash next tick; proposing 7 m/s is safe
    safe = make_state(-21.0, -0.1, 7.0, 0.0, [-10.0, -45.0], [7.0, 7.0],
                      [0.0, 0.0])
    st = jax.tree.map(lambda *xs: jnp.stack(xs), safe, safe)
    speeds, took = mpc.batched_conditional_st(
        st, jnp.asarray([7.0, 30.0]), cfg, jnp.float64)
    took = np.asarray(took)
    assert not took[0] and took[1]
    out = np.asarray(speeds)
    assert out[0] == 7.0 and out[1] != 30.0


def test_per_sampling_frequencies_and_is_weights():
    """Monte-Carlo check that proportional sampling frequencies track the
    priority distribution (the reference's own SumTree self-test,
    dqn.py:1153-1165, samples 1/i weights) and that IS weights equal the
    Schaul et al. correction (N * P(i))^-beta normalized by the batch max,
    computed against the same priority array the sample was drawn from."""
    key = jax.random.PRNGKey(3)
    n = 64
    r = rb.init_replay(n, 4, discrete=True)
    pri = 1.0 / (1.0 + jnp.arange(n, dtype=jnp.float32))
    r = r._replace(priority=pri, size=jnp.asarray(n, jnp.int32))

    counts = np.zeros(n)
    draws = 40
    for i in range(draws):
        idx, _, w = rb.sample_with_weights(r, jax.random.fold_in(key, i),
                                           512, beta=0.5)
        idx = np.asarray(idx)
        counts += np.bincount(idx, minlength=n)
        # exact IS weights for this draw
        probs = np.asarray(pri)[idx] / float(np.sum(np.asarray(pri)))
        expect = (n * probs) ** -0.5
        expect = expect / expect.max()
        np.testing.assert_allclose(np.asarray(w), expect, rtol=1e-4)
    freq = counts / counts.sum()
    expect_freq = np.asarray(pri) / float(np.sum(np.asarray(pri)))
    # 20k draws: relative error on the head of the distribution < 10%
    np.testing.assert_allclose(freq[:8], expect_freq[:8], rtol=0.1)
