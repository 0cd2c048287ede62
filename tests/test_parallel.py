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


def test_tp_sharding_rules_apply():
    """TP hooks (SURVEY §2.3 P2): param trees accept PartitionSpec rules
    over a model axis; unmatched leaves stay replicated."""
    from jax.sharding import Mesh, PartitionSpec as P
    from rl_mpc_lanemerging_tpu.parallel import tp
    from rl_mpc_lanemerging_tpu.models.ddpg import DDPGCritic

    critic = DDPGCritic(hidden=256)
    params = critic.init(jax.random.PRNGKey(0), jnp.zeros((1, 20)),
                         jnp.zeros((1, 1)))
    devs = np.array(jax.devices()).reshape(2, 4)
    mesh = Mesh(devs, ("scenario", "model"))
    placed = tp.shard_params(params, mesh, tp.mlp_tp_rules("model"))

    k0 = placed["params"]["Dense_0"]["kernel"]
    assert len(k0.sharding.device_set) == 8
    # column-parallel: output features split over 4-way model axis
    assert k0.sharding.spec == P(None, "model")
    k1 = placed["params"]["Dense_1"]["kernel"]
    assert k1.sharding.spec == P("model", None)
    # final layer + unmatched leaves replicated
    k2 = placed["params"]["Dense_2"]["kernel"]
    assert k2.sharding.spec == P()
    # the sharded params still compute (XLA inserts the collectives)
    out = jax.jit(lambda p: critic.apply(p, jnp.ones((4, 20)),
                                         jnp.ones((4, 1))))(placed)
    assert np.all(np.isfinite(np.asarray(out)))
