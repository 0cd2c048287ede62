"""RL-facing environments over the vectorized merge world."""

from .merge_env import MergeEnvState, EnvKind, env_reset, env_step

__all__ = ["MergeEnvState", "EnvKind", "env_reset", "env_step"]
