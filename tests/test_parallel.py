"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import sys
import os

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rl_mpc_lanemerging_tpu.parallel import make_mesh, shard_batch


def test_mesh_has_eight_devices():
    assert len(jax.devices()) == 8
    mesh = make_mesh()
    assert mesh.devices.shape == (8,)


def test_shard_batch_places_leading_axis():
    mesh = make_mesh()
    tree = {"a": jnp.zeros((16, 4)), "b": jnp.ones((16,))}
    sharded = shard_batch(tree, mesh)
    shard_count = len(sharded["a"].sharding.device_set)
    assert shard_count == 8


def test_graft_entry_compiles():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    out = np.asarray(out)
    assert out.shape == (8,)
    assert np.all(np.isfinite(out))


def test_graft_dryrun_multichip():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)
