"""Sharded production paths: evaluation and training over the device mesh.

Round-1 left the mesh exercised only by the dry run; this module puts the
*production* loops on it (SURVEY §2.3 — scenario sharding is the primary
parallel axis of the whole design; the reference is strictly single-process,
one episode at a time, control.py:352):

* :func:`sharded_episode_runner` — ``run_episode_batch`` under ``shard_map``:
  each device advances its own scenario shard's episodes to completion
  (divergent while_loop trip counts are fine — there are no collectives
  inside the loop), exactly the semantics of running the reference's
  sequential episodes B times, n_devices at a time.

* :func:`stack_states` / :func:`shard_train_state` — the data-parallel
  trainer scheme: the *global* train state is a stack of per-device local
  states (leading axis = mesh size, every leaf sharded on it, including the
  replay buffer and the parameter copies).  Gradients are ``pmean``-reduced
  inside the update (see agents.ddpg/dqn ``axis_name``), which keeps the
  per-device parameter copies bit-identical — classic DP with XLA
  collectives over ICI instead of the reference's (nonexistent) NCCL.

* :func:`maybe_initialize_distributed` — multi-host (DCN) plumbing via
  ``jax.distributed.initialize``; controller address/process ids come from
  the standard env vars so an N-host launch is
  ``JAX_COORDINATOR=host0:1234 JAX_NUM_PROCESSES=N JAX_PROCESS_ID=i
  python -m rl_mpc_lanemerging_tpu.main ...`` on each host.
"""

from __future__ import annotations

import functools
import logging
import os
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:
    from jax import shard_map as _shard_map   # jax >= 0.8
    _REP_KW = "check_vma"
except ImportError:                            # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map as _shard_map
    _REP_KW = "check_rep"


def shard_map(f, *, mesh, in_specs, out_specs):
    """Version-compat shard_map with the replication check disabled (our
    bodies legitimately produce per-shard values)."""
    return _shard_map(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                      **{_REP_KW: False})

from .mesh import SCENARIO_AXIS, make_mesh, shard_batch

__all__ = ["maybe_initialize_distributed", "auto_mesh",
           "sharded_episode_runner", "stack_states", "unstack_states",
           "shard_train_state", "sharded_train_round"]

logger = logging.getLogger(__name__)

_DISTRIBUTED_INITIALIZED = False


def maybe_initialize_distributed() -> bool:
    """Initialize jax.distributed for multi-host meshes when the standard
    coordinator env vars are present.  Returns True when running
    multi-process.  Safe to call repeatedly."""
    global _DISTRIBUTED_INITIALIZED
    coord = os.environ.get("JAX_COORDINATOR")
    nproc = os.environ.get("JAX_NUM_PROCESSES")
    if coord and nproc and int(nproc) > 1 and not _DISTRIBUTED_INITIALIZED:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(nproc),
            process_id=int(os.environ.get("JAX_PROCESS_ID", "0")))
        _DISTRIBUTED_INITIALIZED = True
        logger.info("jax.distributed initialized: process %s of %s",
                    os.environ.get("JAX_PROCESS_ID", "0"), nproc)
    return jax.process_count() > 1


def auto_mesh() -> Optional[Mesh]:
    """A scenario mesh over every visible device, or None single-device."""
    devs = jax.devices()
    if len(devs) <= 1:
        return None
    return make_mesh(devs)


def sharded_episode_runner(cfg, controller, mesh: Mesh,
                           max_episode_length: float,
                           wait_before_start: float,
                           record_history: bool = False,
                           with_carry: bool = False) -> Callable:
    """worlds (sharded on scenario axis) -> (worlds', EpisodeStats[, hist]
    [, controller carry]), with each device running its shard's episodes
    independently."""
    from ..sim.episode import run_episode_batch

    spec = P(SCENARIO_AXIS)
    n_out = 2 + int(record_history) + int(with_carry)
    out_specs = (spec,) * n_out

    if with_carry:
        def local(worlds, carry):
            return run_episode_batch(
                worlds, cfg, controller,
                max_episode_length=max_episode_length,
                wait_before_start=wait_before_start,
                record_history=record_history,
                controller_carry=carry)

        fn = shard_map(local, mesh=mesh, in_specs=(spec, spec),
                       out_specs=out_specs)
        wrapped = jax.jit(fn)
        return lambda worlds, controller_carry: wrapped(worlds,
                                                        controller_carry)

    def local(worlds):
        return run_episode_batch(
            worlds, cfg, controller,
            max_episode_length=max_episode_length,
            wait_before_start=wait_before_start,
            record_history=record_history)

    fn = shard_map(local, mesh=mesh, in_specs=(spec,),
                   out_specs=out_specs)
    return jax.jit(fn)


# ---------------------------------------------------------------------------
# data-parallel trainer plumbing
# ---------------------------------------------------------------------------

def stack_states(states):
    """Stack n local train states into one global state with a leading
    device axis on every leaf."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *states)


def unstack_states(gstate, i: int = 0):
    """Extract local state i from a (gathered) global state."""
    return jax.tree.map(lambda x: x[i], gstate)


def shard_train_state(gstate, mesh: Mesh):
    """Place a stacked global train state with its device axis on the mesh."""
    return shard_batch(gstate, mesh)


def sharded_train_round(body: Callable, mesh: Mesh) -> Callable:
    """Wrap a per-shard train-round ``body(local_state) -> local_state``
    into a jitted global-state update over the mesh.  ``body`` must reduce
    its gradients with ``lax.pmean(_, SCENARIO_AXIS)``."""
    spec = P(SCENARIO_AXIS)

    def global_body(gstate):
        local = jax.tree.map(lambda x: x[0], gstate)       # (1, ...) -> (...)
        local = body(local)
        return jax.tree.map(lambda x: x[None], local)

    fn = shard_map(global_body, mesh=mesh, in_specs=(spec,),
                   out_specs=spec)
    return jax.jit(fn)
