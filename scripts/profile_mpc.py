#!/usr/bin/env python
"""Stage-level wall-clock breakdown + jax.profiler trace of the MPC tick.

Usage: python scripts/profile_mpc.py [batch] [--trace-dir DIR]

Prints per-stage timings (grid build / Pallas DP / QP / full controller)
and, with --trace-dir, captures a TensorBoard-loadable profiler trace of
the fused controller (the jax.profiler integration the round-1 verdict
asked for).
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from rl_mpc_lanemerging_tpu.config import Settings
from rl_mpc_lanemerging_tpu.planner import mpc
from rl_mpc_lanemerging_tpu.planner.grid import build_st_grid
from rl_mpc_lanemerging_tpu.ops import qp
from rl_mpc_lanemerging_tpu.sim import init_world, warmup, sense_batch
from rl_mpc_lanemerging_tpu.sim.world import add_ego, world_step


def timed(name, fn, *args, iters=10):
    out = jax.block_until_ready(fn(*args))      # compile
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:24s} {dt * 1e3:9.2f} ms/call")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("batch", nargs="?", type=int, default=256)
    ap.add_argument("--trace-dir", default=None,
                    help="capture a jax.profiler trace here")
    args = ap.parse_args()

    cfg = Settings().replace(CRASH_MIN_S=20.0)
    batch = args.batch
    keys = jax.random.split(jax.random.PRNGKey(0), batch)
    worlds = jax.vmap(lambda k: init_world(k, cfg, jnp.float32))(keys)
    worlds = warmup(worlds, cfg, int(50.0 / cfg.TICK_LENGTH))
    worlds = jax.vmap(add_ego)(worlds, jnp.full((batch,), 15.0))
    step = jax.jit(lambda w, c: jax.vmap(
        lambda ww, cc: world_step(ww, cc, cfg))(w, c))
    controller = mpc.make_batched_controller(cfg)
    for _ in range(60):
        states = sense_batch(worlds, cfg)
        worlds = step(worlds, controller(states))
    states = sense_batch(worlds, cfg)

    grid_fn = jax.jit(lambda s: jax.vmap(
        lambda x: build_st_grid(x, cfg, jnp.float32))(s))
    grids = timed("grid build", grid_fn, states)

    if jax.default_backend() != "cpu":
        solver = mpc._pallas_solver(cfg)
        dp_fn = jax.jit(lambda g, st: solver(
            g.obstacles, g.s_values, g.ego_speed,
            st.ego_accel.astype(jnp.float32), g.distances))
        seq = timed("Pallas wavefront DP", dp_fn, grids, states)

        op = qp.build_operator(cfg.fine_horizon, cfg.TICK_LENGTH)
        num_t = seq.shape[1]
        trailing = jnp.argmax(jnp.flip(seq, axis=1) != 0.0, axis=1)
        valid = jnp.where(jnp.all(seq == 0.0, axis=1), 1,
                          num_t - trailing).astype(jnp.int32)
        qp_fn = jax.jit(lambda sq, vl, st: jax.vmap(
            lambda a, b, v, ac: qp.finer_fit_qp(
                a, b, v, ac, op, cfg.T_DISCRETIZATION, cfg.MAX_SPEED,
                cfg.MAX_POSITIVE_ACCELERATION, cfg.MAX_NEGATIVE_ACCELERATION,
                cfg.MAXIMUM_POSITIVE_JERK, cfg.MINIMUM_NEGATIVE_JERK,
                iterations=cfg.QP_ITERATIONS)[0])(
            sq, vl, st.ego_speed.astype(jnp.float32),
            st.ego_accel.astype(jnp.float32)))
        timed("ADMM QP smoother", qp_fn, seq, valid, states)

    timed("full fused controller", controller, states)

    if args.trace_dir:
        with jax.profiler.trace(args.trace_dir):
            for _ in range(5):
                out = controller(states)
            jax.block_until_ready(out)
        print(f"profiler trace written to {args.trace_dir}")


if __name__ == "__main__":
    main()
