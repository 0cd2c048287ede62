"""Dump a single world's closed-loop trajectory for cross-platform diff.

Part of the TPU batch-1024 eval anomaly investigation (see
probe_batch1024.py): run ONE scenario (world index from the prefix-stable
split of the eval seed) for a full episode under the DDPG policy and dump
per-tick ego/traffic state to an .npz.  Run once with --platform cpu and
once on TPU, then compare with --diff A.npz B.npz to locate the first
divergence tick and the state component that moved.

Usage:
  python scripts/trace_world.py --world 289 --out /tmp/w289_cpu.npz --platform cpu
  python scripts/trace_world.py --world 289 --out /tmp/w289_tpu.npz
  python scripts/trace_world.py --diff /tmp/w289_cpu.npz /tmp/w289_tpu.npz
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")


def diff(a_path, b_path):
    import numpy as np
    a = np.load(a_path)
    b = np.load(b_path)
    t_div = None
    for k in a.files:
        if k not in b.files:
            continue
        xa, xb = a[k], b[k]
        n = min(len(xa), len(xb))
        d = np.abs(np.asarray(xa[:n], np.float64)
                   - np.asarray(xb[:n], np.float64))
        while d.ndim > 1:
            d = d.max(axis=-1)
        bad = np.nonzero(d > 1e-4)[0]
        first = int(bad[0]) if bad.size else None
        print(f"{k:16s} first>1e-4 @ tick {first}  max={d.max():.6f}")
        if first is not None:
            t_div = first if t_div is None else min(t_div, first)
    print(f"first divergence tick: {t_div}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--world", type=int, default=289)
    ap.add_argument("--family", default="fast")
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--ticks", type=int, default=500)
    ap.add_argument("--batch", type=int, default=1,
                    help="replicate the world to this batch size (tests "
                         "whether compiled-shape changes the dynamics)")
    ap.add_argument("--out", default="/tmp/world_trace.npz")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--diff", nargs=2, default=None)
    args = ap.parse_args()

    if args.diff:
        return diff(*args.diff)

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    import jax.numpy as jnp
    import numpy as np

    from rl_mpc_lanemerging_tpu import tasks
    from rl_mpc_lanemerging_tpu.agents.ddpg import actor_controller
    from rl_mpc_lanemerging_tpu.checkpoint import load_params
    from rl_mpc_lanemerging_tpu.config import Settings
    from rl_mpc_lanemerging_tpu.sim import sense_batch, warmup
    from rl_mpc_lanemerging_tpu.sim.world import add_ego, world_step

    cfg = Settings.load_from_file(
        f"configs/train_{args.family}_{args.seed}.json")
    params = load_params(
        f"runs/ddpg_{args.family}{args.seed}_extended")["actor"]

    # world args.world from the prefix-stable split, replicated to batch
    worlds_all = tasks.make_worlds(cfg, args.world + 1, jnp.float32)
    w1 = jax.tree.map(lambda x: x[args.world:args.world + 1], worlds_all)
    worlds = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (args.batch,) + x.shape[1:]), w1)

    warm = int(50.0 / cfg.TICK_LENGTH)
    worlds = warmup(worlds, cfg, warm)
    keys = jax.vmap(jax.random.split)(worlds.rng)
    worlds = worlds._replace(rng=keys[:, 0])
    from rl_mpc_lanemerging_tpu.sim.episode import _sample_start_speed
    sp = jax.vmap(lambda k: _sample_start_speed(k, cfg, jnp.float32))(
        keys[:, 1])
    worlds = jax.vmap(add_ego)(worlds, sp)
    worlds = jax.vmap(lambda w, v: world_step(w, v, cfg))(worlds, sp)

    from rl_mpc_lanemerging_tpu.rl.obs import state_vector
    controller = jax.jit(actor_controller(params, cfg))
    obs_fn = jax.jit(lambda s: jax.vmap(
        lambda ss: state_vector(ss, cfg))(s))
    step = jax.jit(lambda w, c: jax.vmap(
        lambda ww, cc: world_step(ww, cc, cfg))(w, c))

    rec = {k: [] for k in ("ego_x", "ego_v", "ego_arc", "cmd",
                           "crashed", "cars_x", "cars_v", "obs",
                           "other_x", "other_present")}
    for t in range(args.ticks):
        states = sense_batch(worlds, cfg)
        rec["obs"].append(np.asarray(obs_fn(states)[0]))
        rec["other_x"].append(np.asarray(states.other_x[0]))
        rec["other_present"].append(np.asarray(states.other_present[0]))
        cmd = controller(states)
        worlds = step(worlds, cmd)
        rec["ego_x"].append(float(states.ego_x[0]))
        rec["ego_v"].append(float(worlds.ego_v[0]))
        rec["ego_arc"].append(float(worlds.ego_arc[0]))
        rec["cmd"].append(float(cmd[0]))
        rec["crashed"].append(bool(worlds.ego_collided[0]))
        rec["cars_x"].append(np.asarray(worlds.cars_x[0]))
        rec["cars_v"].append(np.asarray(worlds.cars_v[0]))
        if rec["crashed"][-1]:
            print(f"crash at tick {t}")
            break
    np.savez(args.out, **{k: np.asarray(v) for k, v in rec.items()})
    print(f"wrote {args.out} ({len(rec['ego_x'])} ticks, "
          f"crashed={rec['crashed'][-1]})")


if __name__ == "__main__":
    main()
