"""rl_mpc_lanemerging_tpu — a TPU-native RL+MPC lane-merging framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
jlubars/RL-MPC-LaneMerging (arXiv:2011.08484): a spatio-temporal MPC
trajectory optimizer, a reactive traffic forecaster, a vectorized merge-world
simulator, DQN/DDPG/Rainbow agents, and the combined RL+MPC safety arbiter —
all batched over scenarios and sharded over TPU meshes.

Everything is a batch: the fundamental unit is a pytree of device arrays
describing B merge scenarios evolving in lockstep.  Single-scenario use is
the B=1 view of the same code.
"""

from .config import Settings, default_settings, load_settings

__version__ = "0.1.0"

__all__ = ["Settings", "default_settings", "load_settings", "__version__"]
