"""Mesh construction and scenario-sharded execution helpers."""

from .mesh import make_mesh, shard_batch, scenario_sharding

__all__ = ["make_mesh", "shard_batch", "scenario_sharding"]
