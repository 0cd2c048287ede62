"""Gym-compatible single-scenario environment surface.

The reference registers its three SUMO environments with Gym so
third-party trainers can ``gym.make`` them (reference:
merge_gym.py:228-246 ``register_environments`` -> ``sumo-jerk-v0``,
``sumo-accel-v0``, ``sumo-jerk-continuous-v0``).  The TPU-native
environments are batched device pytrees (envs/merge_env.py), which is
what this framework's own trainers consume; this module closes the
compatibility gap for external trainers with a host-side adapter that
steps one scenario (B=1) through the jitted batched step.

Design notes (TPU-first, not a port):

* the adapter drives the *same* compiled ``env_step`` as the batched
  trainers — semantics are identical by construction, and the jit cache
  is shared;
* the reference blocks inside ``reset`` while SUMO warms up traffic
  (merge_gym.py:142-149); here reset advances the device world through
  the warmup ticks before returning the first observation;
* ``step`` follows the Gymnasium 5-tuple API
  ``(obs, reward, terminated, truncated, info)`` — the modern trainer
  surface — where the reference's Gym 0.21 API returned 4-tuples;
  ``info["invalid_action"]``-style extras are folded into the reward
  exactly as in the batched env.

``gym``/``gymnasium`` are not required: the adapter ships minimal
space descriptors and ``register_environments()`` degrades to a no-op
with a warning when neither package is importable (this image ships
neither).
"""

from __future__ import annotations

import logging
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Settings
from ..sim import init_world
from .merge_env import EnvKind, env_reset, env_step

__all__ = ["MergeGymEnv", "JerkEnv", "AccelerationEnv",
           "ContinuousJerkEnv", "register_environments", "ENV_IDS"]

logger = logging.getLogger(__name__)

ENV_IDS = {
    "sumo-jerk-v0": EnvKind.JERK,
    "sumo-accel-v0": EnvKind.ACCELERATION,
    "sumo-jerk-continuous-v0": EnvKind.CONTINUOUS_JERK,
}


def _spaces():
    """Return (Box, Discrete) — real Gym spaces when available, otherwise
    lightweight stand-ins with the same core attributes."""
    try:                                     # pragma: no cover - optional
        from gymnasium import spaces
        return spaces.Box, spaces.Discrete
    except ImportError:
        pass
    try:                                     # pragma: no cover - optional
        from gym import spaces
        return spaces.Box, spaces.Discrete
    except ImportError:
        pass

    class _Box:
        def __init__(self, low, high, shape=None, dtype=np.float32):
            self.low = np.broadcast_to(np.asarray(low, dtype), shape).copy()
            self.high = np.broadcast_to(np.asarray(high, dtype),
                                        shape).copy()
            self.shape = tuple(shape)
            self.dtype = dtype

        def sample(self, rng=np.random):
            return rng.uniform(self.low, self.high).astype(self.dtype)

        def contains(self, x):
            x = np.asarray(x)
            return x.shape == self.shape and bool(
                np.all(x >= self.low) and np.all(x <= self.high))

    class _Discrete:
        def __init__(self, n):
            self.n = int(n)
            self.shape = ()
            self.dtype = np.int64

        def sample(self, rng=np.random):
            return int(rng.randint(self.n))

        def contains(self, x):
            return 0 <= int(x) < self.n

    return _Box, _Discrete


def _env_base():
    """gymnasium.Env / gym.Env when available (gymnasium.make refuses
    classes not inheriting its Env), plain object otherwise."""
    try:
        import gymnasium
        return gymnasium.Env
    except ImportError:                      # pragma: no cover - optional
        try:
            import gym
            return gym.Env
        except ImportError:
            return object


class MergeGymEnv(_env_base()):
    """Single-scenario Gym(nasium)-API adapter over the batched TPU env.

    ``config`` accepts the reference's env-config keys
    (merge_gym.py:17-26): ``max_episode_length``, ``wait_before_start``,
    plus ``settings`` (a :class:`Settings`) and ``seed``.
    """

    kind: EnvKind = EnvKind.CONTINUOUS_JERK
    metadata = {"render_modes": []}

    def __init__(self, config: Optional[dict] = None):
        config = dict(config or {})
        self.cfg: Settings = config.get("settings") or Settings()
        self.max_episode_length = float(
            config.get("max_episode_length", self.cfg.MAX_EPISODE_LENGTH))
        self.wait_before_start = float(config.get("wait_before_start", 20))
        self._seed = config.get("seed", 0)
        self._episode = 0
        self._env = None

        Box, Discrete = _spaces()
        d = self.cfg.obs_dim
        self.observation_space = Box(-np.inf, np.inf, shape=(d,),
                                     dtype=np.float32)
        if self.kind == EnvKind.JERK:
            self.action_space = Discrete(len(self.cfg.JERK_VALUES_DQN))
        elif self.kind == EnvKind.ACCELERATION:
            self.action_space = Discrete(
                len(self.cfg.ACCELERATION_VALUES_DQN))
        else:
            self.action_space = Box(self.cfg.MINIMUM_NEGATIVE_JERK,
                                    self.cfg.MAXIMUM_POSITIVE_JERK,
                                    shape=(1,), dtype=np.float32)

    # -- Gymnasium API ---------------------------------------------------
    def reset(self, *, seed: Optional[int] = None, options=None):
        if seed is not None:
            self._seed = seed
        key = jax.random.fold_in(jax.random.PRNGKey(self._seed),
                                 self._episode)
        self._episode += 1
        world = jax.vmap(lambda k: init_world(k, self.cfg, jnp.float32))(
            key[None])
        # the batched env only inserts the ego on the warmup_left==1 ->
        # 0 transition, so a sub-tick wait would produce an egoless
        # ghost episode; clamp to at least one warmup tick
        wait = max(self.wait_before_start, self.cfg.TICK_LENGTH)
        env = env_reset(world, self.cfg, wait_before_start=wait)
        # advance through warmup so the first obs is the episode start
        # (the reference blocks in reset, merge_gym.py:142-149); the
        # tick count is host-known — no per-tick device sync needed
        noop = self._noop_action()
        for _ in range(int(wait / self.cfg.TICK_LENGTH)):
            env, _ = env_step(env, noop, self.cfg, self.kind,
                              max_episode_length=self.max_episode_length,
                              wait_before_start=wait)
        self._env = env
        self._wait = wait
        return np.asarray(env.obs[0]), {}

    def step(self, action):
        if self._env is None:
            raise RuntimeError("call reset() before step()")
        act = self._encode_action(action)
        env, tr = env_step(self._env, act, self.cfg, self.kind,
                           max_episode_length=self.max_episode_length,
                           wait_before_start=getattr(
                               self, "_wait", self.wait_before_start))
        self._env = env
        terminated = bool(tr["terminal"][0])
        truncated = bool(tr["done"][0]) and not terminated
        if terminated or truncated:
            self._env = None                 # require reset()
        info = {"crashed": bool(tr["collided"][0]),
                "merged": bool(tr["arrived"][0])}
        return (np.asarray(tr["next_obs"][0]), float(tr["reward"][0]),
                terminated, truncated, info)

    def close(self):
        self._env = None

    # -- helpers ---------------------------------------------------------
    def _noop_action(self):
        if self.kind == EnvKind.CONTINUOUS_JERK:
            return jnp.zeros((1,), jnp.float32)
        if self.kind == EnvKind.JERK:
            # middle entry of the symmetric jerk table is 0
            return jnp.full((1,), len(self.cfg.JERK_VALUES_DQN) // 2,
                            jnp.int32)
        table = np.asarray(self.cfg.ACCELERATION_VALUES_DQN)
        return jnp.full((1,), int(np.argmin(np.abs(table))), jnp.int32)

    def _encode_action(self, action):
        if self.kind == EnvKind.CONTINUOUS_JERK:
            return jnp.asarray(np.asarray(action, np.float32).reshape(1))
        return jnp.asarray([int(np.asarray(action).reshape(()))],
                           jnp.int32)


class JerkEnv(MergeGymEnv):
    kind = EnvKind.JERK


class AccelerationEnv(MergeGymEnv):
    kind = EnvKind.ACCELERATION


class ContinuousJerkEnv(MergeGymEnv):
    kind = EnvKind.CONTINUOUS_JERK


_ENTRY_POINTS = {
    "sumo-jerk-v0": JerkEnv,
    "sumo-accel-v0": AccelerationEnv,
    "sumo-jerk-continuous-v0": ContinuousJerkEnv,
}


def register_environments() -> bool:
    """Register the three env IDs (reference merge_gym.py:228-246) with
    gymnasium or gym, whichever is importable.  Returns True when a
    registry accepted them; False (with a warning) when neither package
    is present — the adapter classes remain directly constructible."""
    mod = None
    try:                                     # pragma: no cover - optional
        import gymnasium as mod
    except ImportError:
        try:                                 # pragma: no cover - optional
            import gym as mod
        except ImportError:
            pass
    if mod is None:
        logger.warning(
            "neither gymnasium nor gym is installed; "
            "sumo-*-v0 IDs not registered (construct "
            "rl_mpc_lanemerging_tpu.envs.gym_compat classes directly)")
        return False
    for env_id, cls in _ENTRY_POINTS.items():            # pragma: no cover
        mod.envs.register(
            id=env_id,
            entry_point=f"{cls.__module__}:{cls.__name__}",
            max_episode_steps=500,
            kwargs={"config": {}})
    return True
