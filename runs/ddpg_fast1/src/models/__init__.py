"""Flax network definitions for the RL agents."""

from .mlp import DQNNet
from .ddpg import DDPGActor, DDPGCritic
from .rainbow import RainbowNet

__all__ = ["DQNNet", "DDPGActor", "DDPGCritic", "RainbowNet"]
