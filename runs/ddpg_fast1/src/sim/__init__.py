"""Vectorized merge-world simulator and batched episode runtime."""

from .world import WorldState, init_world, world_step, sense, add_ego, \
    remove_ego
from .episode import EpisodeStats, run_episode_batch, warmup, sense_batch

__all__ = ["WorldState", "init_world", "world_step", "sense", "add_ego",
           "remove_ego", "EpisodeStats", "run_episode_batch", "warmup",
           "sense_batch"]
