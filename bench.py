#!/usr/bin/env python
"""Headline benchmark: full-horizon MPC solves/s on one chip.

The metric mirrors BASELINE.md: the reference's Cython solver sustains
~12.7 full MPC control steps per second on one CPU core at st_default
settings (1 / 0.0789 s clock_time_per_step, saved_data.csv row 18).  Here
one "solve" is the complete fused per-tick controller: obstacle-grid build
(18 forecast rolls) + lattice DP over the 18 x 3001 grid + 300-iteration
ADMM QP refine + first-step command extraction.

Prints exactly one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import functools
import json
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from rl_mpc_lanemerging_tpu.config import Settings
from rl_mpc_lanemerging_tpu.planner import mpc
from rl_mpc_lanemerging_tpu.sim import init_world, warmup, sense_batch
from rl_mpc_lanemerging_tpu.sim.world import add_ego, world_step

BASELINE_SOLVES_PER_S = 12.7  # st_default, 1 CPU core (BASELINE.md)


def main(batch: int = 256, iters: int = 20) -> None:
    cfg = Settings().replace(CRASH_MIN_S=20.0)  # st_default solver settings
    dtype = jnp.float32

    keys = jax.random.split(jax.random.PRNGKey(0), batch)
    worlds = jax.vmap(lambda k: init_world(k, cfg, dtype))(keys)
    worlds = warmup(worlds, cfg, int(50.0 / cfg.TICK_LENGTH))
    start = jnp.full((batch,), 15.0, dtype)
    worlds = jax.vmap(add_ego)(worlds, start)
    step = jax.jit(lambda w, c: jax.vmap(
        lambda ww, cc: world_step(ww, cc, cfg))(w, c))
    controller = mpc.make_batched_controller(cfg)

    # drive egos into the merge region so the benchmark states are the
    # expensive, obstacle-rich ones (not free-road solves)
    for _ in range(60):
        states = sense_batch(worlds, cfg)
        cmds = controller(states)
        worlds = step(worlds, cmds)
    states = sense_batch(worlds, cfg)
    jax.block_until_ready(controller(states))  # compile + warm

    t0 = time.perf_counter()
    for _ in range(iters):
        out = controller(states)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    solves_per_s = batch * iters / dt
    print(json.dumps({
        "metric": "mpc_solves_per_s",
        "value": round(solves_per_s, 1),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / BASELINE_SOLVES_PER_S, 1),
    }))


if __name__ == "__main__":
    import sys
    kw = {}
    if len(sys.argv) > 1:
        kw["batch"] = int(sys.argv[1])
    if len(sys.argv) > 2:
        kw["iters"] = int(sys.argv[2])
    main(**kw)
