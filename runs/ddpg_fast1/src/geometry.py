"""Merge-area geometry: Frenet-style s-coordinate maps and the ego route.

TPU-native, fully vectorized re-design of the reference's scalar coordinate
helpers (reference: control.py:366-389).  All functions are pure jnp and
broadcast over arbitrary leading batch dimensions, so the same code serves a
single scenario or a sharded batch of thousands.

Geometry constants come from the reference network (merge.net.xml):

* ``merge_point``  = (-50.9, 1.72): where the ramp meets the junction
  (reference control.py:366)
* ``merge_point2`` = (1.5, -1.5):  end of the junction's internal merge lane
  (reference control.py:367)
* ``merge_point3`` = (-51, -1.5):  the highway point abreast of the merge
  (reference control.py:368)

The ego s coordinate is negative distance-to-merge-point before the merge,
positive distance past it, and linear in x after the junction
(reference control.py:373-380).  Obstacle s is simply x + 51
(reference control.py:383-389).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ._route_data import ROUTE_ARC, ROUTE_XY

__all__ = [
    "MERGE_POINT", "MERGE_POINT2", "MERGE_POINT3", "MERGE_DISTANCE",
    "COMMON_S", "HIGHWAY_Y", "EGO_DEPART_ARC", "EGO_ARRIVAL_ARC",
    "TRAFFIC_SPAWN_X", "TRAFFIC_EXIT_X",
    "get_ego_s", "get_obstacle_s_from_x", "route_xy", "route_arc_total",
]

MERGE_POINT = (-50.9, 1.72)
MERGE_POINT2 = (1.5, -1.5)
MERGE_POINT3 = (-51.0, -1.5)
MERGE_DISTANCE = float(np.hypot(MERGE_POINT[0] - MERGE_POINT2[0],
                                MERGE_POINT[1] - MERGE_POINT2[1]))
# s value shared by the ego map and the obstacle map at the junction exit
# (reference control.py:370): merge_point2.x - merge_point3.x = 52.5
COMMON_S = MERGE_POINT2[0] - MERGE_POINT3[0]

HIGHWAY_Y = -1.6  # the single highway lane's y (merge.net.xml highwayahead_0)

# Ego departs at lane position 40 on the ramp and arrives at position 50 on
# highwayahead (reference control.py:42: departPos=40, arrivalPos=50).
EGO_DEPART_ARC = 40.0
_RAMP_LEN = 201.90961137044434          # ramp_0 lane length (merge.net.xml)
_INTERNAL_LEN = 52.18                   # :mergenode_1_0 length
EGO_ARRIVAL_ARC = _RAMP_LEN + _INTERNAL_LEN + 50.0
# arc at which the ego enters the junction's internal merge lane and starts
# occupying the highway conflict area (SUMO junction blocking)
EGO_JUNCTION_ARC = _RAMP_LEN

# Traffic cars enter highwayrear at x=-250 (front bumper at -245 after the
# 5 m body is placed) and leave the network at x=100 (merge.net.xml).
TRAFFIC_SPAWN_X = -245.0
TRAFFIC_EXIT_X = 100.0

_ROUTE_XY = jnp.asarray(ROUTE_XY)
_ROUTE_ARC = jnp.asarray(ROUTE_ARC)


def route_arc_total() -> float:
    return float(ROUTE_ARC[-1])


import jax as _jax


@_jax.jit
def route_xy(arc):
    """Map ego route arc-length -> (x, y), piecewise-linear on the net shape.

    Broadcasts over any batch shape.  Arcs past the route end extrapolate
    along the final highway segment.
    """
    arc = jnp.asarray(arc)
    dtype = arc.dtype if jnp.issubdtype(arc.dtype, jnp.floating) \
        else jnp.result_type(float)
    route_arc = _ROUTE_ARC.astype(dtype)
    route_xy_tab = _ROUTE_XY.astype(dtype)
    idx = jnp.clip(jnp.searchsorted(route_arc, arc, side="right") - 1,
                   0, route_arc.shape[0] - 2)
    a0 = route_arc[idx]
    a1 = route_arc[idx + 1]
    w = (arc - a0) / jnp.maximum(a1 - a0, 1e-9)
    p0 = route_xy_tab[idx]
    p1 = route_xy_tab[idx + 1]
    return p0 + (p1 - p0) * w[..., None]


def _dist_to(pos_x, pos_y, point):
    return jnp.sqrt((pos_x - point[0]) ** 2 + (pos_y - point[1]) ** 2)


def get_ego_s(pos_x, pos_y):
    """Ego s coordinate (reference control.py:373-380), vectorized."""
    pos_x = jnp.asarray(pos_x)
    pos_y = jnp.asarray(pos_y)
    before = -_dist_to(pos_x, pos_y, MERGE_POINT)
    merging = _dist_to(pos_x, pos_y, MERGE_POINT)
    after = pos_x - MERGE_POINT2[0] + COMMON_S
    return jnp.where(pos_x < MERGE_POINT[0], before,
                     jnp.where(pos_x < MERGE_POINT2[0], merging, after))


def get_obstacle_s_from_x(x):
    """Obstacle s coordinate (reference control.py:388-389), vectorized."""
    return jnp.asarray(x) - MERGE_POINT3[0]
