"""Device mesh + scenario sharding.

The framework's primary parallel axis is the *scenario* batch (SURVEY §2.3):
every data structure carries a leading batch dimension, so data parallelism
is a single ``NamedSharding(mesh, P("scenario"))`` on that axis — XLA
inserts the collectives (psum reductions for metrics/gradients ride the ICI
mesh).  The reference has no distributed execution at all (single process,
one SUMO, one episode at a time — SURVEY §2.3); this module is where the
TPU build scales past it.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "scenario_sharding", "shard_batch"]

SCENARIO_AXIS = "scenario"


def make_mesh(devices: Optional[Sequence[jax.Device]] = None,
              axis: str = SCENARIO_AXIS) -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def scenario_sharding(mesh: Mesh, axis: str = SCENARIO_AXIS
                      ) -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def shard_batch(tree, mesh: Mesh, axis: str = SCENARIO_AXIS):
    """Place a batched pytree with its leading axis split over the mesh."""
    sharding = scenario_sharding(mesh, axis)

    def place(x):
        spec = P(axis, *([None] * (x.ndim - 1))) if x.ndim > 0 else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(place, tree)
