"""Gym-compatibility adapter (reference merge_gym.py:228-246): the three
env IDs exist as single-scenario Gymnasium-API classes over the batched
TPU env, constructible without gym/gymnasium installed."""

import numpy as np

from rl_mpc_lanemerging_tpu.config import Settings
from rl_mpc_lanemerging_tpu.envs.gym_compat import (
    ENV_IDS, AccelerationEnv, ContinuousJerkEnv, JerkEnv,
    register_environments)


def _fast_cfg():
    return Settings()


def test_env_ids_cover_reference():
    assert set(ENV_IDS) == {"sumo-jerk-v0", "sumo-accel-v0",
                            "sumo-jerk-continuous-v0"}


def test_register_and_make():
    # this image ships gymnasium: the three reference IDs register and
    # gymnasium.make round-trips the full API (were neither gym package
    # importable, register_environments degrades to False, not a raise)
    registered = register_environments()
    try:
        import gymnasium
    except ImportError:
        assert registered is False
        return
    assert registered is True
    env = gymnasium.make("sumo-jerk-continuous-v0",
                         config={"wait_before_start": 1.0, "seed": 2})
    obs, info = env.reset()
    assert obs.shape == (env.unwrapped.cfg.obs_dim,)
    obs, reward, term, trunc, info = env.step(
        np.asarray([1.0], np.float32))
    assert np.isfinite(reward)
    env.close()


def test_continuous_env_api():
    env = ContinuousJerkEnv({"settings": _fast_cfg(),
                             "wait_before_start": 2.0,
                             "max_episode_length": 30.0, "seed": 3})
    obs, info = env.reset()
    assert obs.shape == (env.cfg.obs_dim,)
    assert env.action_space.shape == (1,)
    total_steps = 0
    terminated = truncated = False
    while not (terminated or truncated) and total_steps < 200:
        obs, reward, terminated, truncated, info = env.step(
            np.asarray([1.0], np.float32))
        total_steps += 1
        assert obs.shape == (env.cfg.obs_dim,)
        assert isinstance(reward, float)
    assert terminated or truncated
    assert {"crashed", "merged"} <= set(info)


def test_discrete_envs_spaces_and_step():
    cfg = _fast_cfg()
    jenv = JerkEnv({"settings": cfg, "wait_before_start": 1.0})
    aenv = AccelerationEnv({"settings": cfg, "wait_before_start": 1.0})
    assert jenv.action_space.n == len(cfg.JERK_VALUES_DQN)
    assert aenv.action_space.n == len(cfg.ACCELERATION_VALUES_DQN)
    for env in (jenv, aenv):
        obs, _ = env.reset(seed=11)
        obs2, reward, term, trunc, _ = env.step(env.action_space.n - 1)
        assert obs2.shape == obs.shape
        assert np.isfinite(reward)


def test_reset_reseeds_episodes():
    env = ContinuousJerkEnv({"settings": _fast_cfg(),
                             "wait_before_start": 1.0, "seed": 5})
    a, _ = env.reset()
    b, _ = env.reset()
    # different episode keys -> different spawned traffic
    assert not np.allclose(a, b)
