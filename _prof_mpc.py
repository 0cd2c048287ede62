import functools, time, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from rl_mpc_lanemerging_tpu.config import Settings
from rl_mpc_lanemerging_tpu.planner import mpc
from rl_mpc_lanemerging_tpu.planner.grid import build_st_grid
from rl_mpc_lanemerging_tpu.ops import qp, st_dp
from rl_mpc_lanemerging_tpu.sim import init_world, warmup, sense_batch
from rl_mpc_lanemerging_tpu.sim.world import add_ego, world_step

cfg = Settings().replace(CRASH_MIN_S=20.0)
batch = 256
keys = jax.random.split(jax.random.PRNGKey(0), batch)
worlds = jax.vmap(lambda k: init_world(k, cfg, jnp.float32))(keys)
worlds = warmup(worlds, cfg, int(50.0/cfg.TICK_LENGTH))
worlds = jax.vmap(add_ego)(worlds, jnp.full((batch,), 15.0))
step = jax.jit(lambda w, c: jax.vmap(lambda ww, cc: world_step(ww, cc, cfg))(w, c))
controller = mpc.make_batched_controller(cfg)
for _ in range(60):
    states = sense_batch(worlds, cfg)
    worlds = step(worlds, controller(states))
states = sense_batch(worlds, cfg)

grid_fn = jax.jit(lambda s: jax.vmap(lambda x: build_st_grid(x, cfg, jnp.float32))(s))
grids = jax.block_until_ready(grid_fn(states))

solver = mpc._pallas_solver(cfg)
dp_fn = jax.jit(lambda g, st: solver(g.obstacles, g.s_values, g.ego_speed, st.ego_accel.astype(jnp.float32), g.distances))
seq = jax.block_until_ready(dp_fn(grids, states))

op = qp.build_operator(cfg.fine_horizon, cfg.TICK_LENGTH)
num_t = seq.shape[1]
trailing = jnp.argmax(jnp.flip(seq, axis=1) != 0.0, axis=1)
valid = jnp.where(jnp.all(seq==0.0, axis=1), 1, num_t - trailing).astype(jnp.int32)
qp_fn = jax.jit(lambda sq, vl, v, a: jax.vmap(lambda s_, l_, v_, a_: qp.finer_fit_qp(
    s_, l_, v_, a_, op, cfg.T_DISCRETIZATION, cfg.MAX_SPEED,
    cfg.MAX_POSITIVE_ACCELERATION, cfg.MAX_NEGATIVE_ACCELERATION,
    cfg.MAXIMUM_POSITIVE_JERK, cfg.MINIMUM_NEGATIVE_JERK,
    iterations=cfg.QP_ITERATIONS))(sq, vl, v, a))
fine = jax.block_until_ready(qp_fn(seq, valid, states.ego_speed, states.ego_accel))

def bench(name, f, *a, iters=30):
    out = f(*a); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters): out = f(*a)
    jax.block_until_ready(out)
    dt = (time.perf_counter()-t0)/iters
    print(f"{name}: {dt*1e3:.2f} ms  ({batch/dt:.0f}/s)")

bench("grid_build", grid_fn, states)
bench("pallas_dp", dp_fn, grids, states)
bench("qp_refine", qp_fn, seq, valid, states.ego_speed, states.ego_accel)
bench("full_controller", controller, states)
print("QP_ITERATIONS =", cfg.QP_ITERATIONS, " num_t =", cfg.num_t, " num_s =", cfg.num_s)
