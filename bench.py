#!/usr/bin/env python
"""Headline benchmark: full-horizon MPC solves/s on one chip (and mesh).

The metric mirrors BASELINE.md: the reference's Cython solver sustains
~12.7 full MPC control steps per second on one CPU core at st_default
settings (1 / 0.0789 s clock_time_per_step, saved_data.csv row 18).  Here
one "solve" is the complete fused per-tick controller: obstacle-grid build
(18 forecast rolls) + lattice DP over the 18 x 3001 grid + 300-iteration
ADMM QP refine + first-step command extraction.

Prints a batch-scaling sweep as informational JSON lines, then exactly one
final headline JSON line: {"metric", "value", "unit", "vs_baseline"} — the
best solves/s over the sweep.  With >1 visible device the sweep also runs
the scenario-sharded mesh path and reports per-chip and whole-mesh rates.
"""

import json
import os
import time

import jax
import jax.numpy as jnp

if os.environ.get("BENCH_PLATFORM"):
    # host-only debugging (the ambient axon shim ignores JAX_PLATFORMS)
    jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from rl_mpc_lanemerging_tpu.config import Settings
from rl_mpc_lanemerging_tpu.planner import mpc
from rl_mpc_lanemerging_tpu.sim import init_world, warmup, sense_batch
from rl_mpc_lanemerging_tpu.sim.world import add_ego, world_step

BASELINE_SOLVES_PER_S = 12.7  # st_default, 1 CPU core (BASELINE.md)


def _bench_states(cfg, batch, dtype=jnp.float32):
    """Drive egos into the merge region so the measured solves are the
    expensive, obstacle-rich ones (not free-road solves)."""
    keys = jax.random.split(jax.random.PRNGKey(0), batch)
    worlds = jax.vmap(lambda k: init_world(k, cfg, dtype))(keys)
    worlds = warmup(worlds, cfg, int(50.0 / cfg.TICK_LENGTH))
    worlds = jax.vmap(add_ego)(worlds, jnp.full((batch,), 15.0, dtype))
    step = jax.jit(lambda w, c: jax.vmap(
        lambda ww, cc: world_step(ww, cc, cfg))(w, c))
    controller = mpc.make_batched_controller(cfg)
    for _ in range(60):
        states = sense_batch(worlds, cfg)
        worlds = step(worlds, controller(states))
    return sense_batch(worlds, cfg)


def _time_controller(controller, states, batch, iters):
    jax.block_until_ready(controller(states))   # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        out = controller(states)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    return batch * iters / dt


def main(batch: int = 0, iters: int = 20) -> None:
    cfg = Settings().replace(CRASH_MIN_S=20.0)  # st_default solver settings
    n_dev = len(jax.devices())

    batches = [batch] if batch else [128, 256, 512, 1024]
    best = 0.0
    controller = mpc.make_batched_controller(cfg)
    for b in batches:
        states = _bench_states(cfg, b)
        rate = _time_controller(controller, states, b, iters)
        print(json.dumps({"metric": "mpc_solves_per_s_sweep", "batch": b,
                          "value": round(rate, 1), "unit": "solves/s",
                          "devices": 1}))
        best = max(best, rate)

    if n_dev > 1:
        # whole-mesh rate: scenario-sharded controller over every device
        from rl_mpc_lanemerging_tpu.parallel import make_mesh, shard_batch
        from rl_mpc_lanemerging_tpu.parallel.sharded import shard_map
        from jax.sharding import PartitionSpec as P
        mesh = make_mesh()
        b = max(batches) if not batch else batch
        b = -(-b // n_dev) * n_dev
        states = _bench_states(cfg, b)
        states = shard_batch(states, mesh)
        spec = P("scenario")
        sharded_ctrl = jax.jit(shard_map(
            controller, mesh=mesh, in_specs=(spec,), out_specs=spec))
        rate = _time_controller(sharded_ctrl, states, b, iters)
        print(json.dumps({"metric": "mpc_solves_per_s_mesh", "batch": b,
                          "value": round(rate, 1), "unit": "solves/s",
                          "devices": n_dev,
                          "per_chip": round(rate / n_dev, 1)}))

    print(json.dumps({
        "metric": "mpc_solves_per_s",
        "value": round(best, 1),
        "unit": "solves/s",
        "vs_baseline": round(best / BASELINE_SOLVES_PER_S, 1),
    }))


if __name__ == "__main__":
    import sys
    kw = {}
    if len(sys.argv) > 1:
        kw["batch"] = int(sys.argv[1])
    if len(sys.argv) > 2:
        kw["iters"] = int(sys.argv[2])
    main(**kw)
