"""Worker for the 2-process multi-host test (tests/test_multihost.py).

Each process owns 4 virtual CPU devices (XLA_FLAGS set by the launcher) and
joins a jax.distributed cluster; the global 8-device scenario mesh spans
both processes — the same code path an N-host TPU pod launch uses
(parallel/sharded.py maybe_initialize_distributed; SURVEY §2.3 comm
backend).  The sharded episode runner advances each process's local
scenario shard; a pjit'd global mean over the sharded stats exercises a
cross-process collective (psum over DCN in production, gRPC here).

Process 0 writes the aggregate metrics as JSON for the test to compare
against a single-process run with identical seeds.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    port = os.environ["MH_PORT"]
    nproc = int(os.environ["MH_NPROC"])
    pid = int(os.environ["MH_PID"])
    out_path = os.environ.get("MH_OUT")

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.device_count() == 4 * nproc, jax.device_count()
    assert jax.local_device_count() == 4

    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import multihost_utils
    from jax.sharding import NamedSharding, PartitionSpec as P

    from rl_mpc_lanemerging_tpu.config import Settings
    from rl_mpc_lanemerging_tpu.parallel.mesh import make_mesh, SCENARIO_AXIS
    from rl_mpc_lanemerging_tpu.parallel import sharded
    from rl_mpc_lanemerging_tpu.sim import init_world

    cfg = Settings().replace(MAX_CARS=32, MAX_SENSED_CARS=16)
    dtype = jnp.float32
    global_batch = jax.device_count()
    local = jax.local_device_count()

    # every process builds only its own shard's worlds, from globally
    # consistent per-scenario seeds
    keys = jax.random.split(jax.random.PRNGKey(42), global_batch)
    local_keys = keys[pid * local:(pid + 1) * local]
    local_worlds = jax.vmap(lambda k: init_world(k, cfg, dtype))(local_keys)

    mesh = make_mesh()
    worlds = multihost_utils.host_local_array_to_global_array(
        jax.tree.map(np.asarray, local_worlds), mesh, P(SCENARIO_AXIS))

    def controller(state):
        return jnp.full_like(state.ego_speed, 10.0)

    runner = sharded.sharded_episode_runner(
        cfg, controller, mesh, max_episode_length=60.0,
        wait_before_start=30.0)
    worlds2, stats = runner(worlds)

    # cross-process reduction: global means via a jitted mean over the
    # sharded stats arrays (XLA inserts the psum across processes)
    mean_sharding = NamedSharding(mesh, P())

    @jax.jit
    def global_means(stats):
        return {
            "crashed": jnp.mean(stats.crashed.astype(jnp.float32)),
            "merged": jnp.mean(stats.merged.astype(jnp.float32)),
            "ticks": jnp.mean(stats.ticks.astype(jnp.float32)),
            "sum_speed": jnp.mean(stats.sum_speed),
            "start_speed": jnp.mean(stats.start_speed),
        }

    means = jax.jit(global_means, out_shardings=mean_sharding)(stats)
    means = {k: float(v) for k, v in means.items()}

    if pid == 0 and out_path:
        with open(out_path, "w") as fh:
            json.dump(means, fh)
    multihost_utils.sync_global_devices("done")


if __name__ == "__main__":
    main()
