"""DDPG actor-critic networks.

The reference delegates DDPG to the ``autonomous-learning-library`` 0.5.3
preset (reference: ddpg.py:49-53); the library's internals are outside the
repo, so per SURVEY §7.3 the architecture is re-derived from the published
DDPG algorithm: a deterministic tanh-squashed actor over the continuous
jerk range and a state-action Q critic, both small fc ReLU nets sized for
the 20-d observation.  The time feature the library's ``TimeFeature`` body
appends at evaluation (reference ddpg.py:41) is an explicit observation
column here (see envs.merge_env).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

__all__ = ["DDPGActor", "DDPGCritic"]


class DDPGActor(nn.Module):
    """obs -> action in [action_low, action_high] (jerk)."""

    action_low: float = -5.0
    action_high: float = 5.0
    hidden: int = 256

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Dense(self.hidden)(x))
        x = nn.relu(nn.Dense(self.hidden)(x))
        raw = nn.Dense(1)(x)
        mid = 0.5 * (self.action_high + self.action_low)
        half = 0.5 * (self.action_high - self.action_low)
        return mid + half * jnp.tanh(raw)


class DDPGCritic(nn.Module):
    hidden: int = 256

    @nn.compact
    def __call__(self, obs, action):
        x = jnp.concatenate([obs, action], axis=-1)
        x = nn.relu(nn.Dense(self.hidden)(x))
        x = nn.relu(nn.Dense(self.hidden)(x))
        return nn.Dense(1)(x)[..., 0]
