"""Dissect the ST controller's jerk profile (VERDICT r5 item 2).

The sparse/fast-traffic ST rows carry +8-38% mean |jerk| vs the
reference while default/medium match within 2% (ACCEPTANCE.md §st), and
two one-variable sim A/Bs (yield gate, no-pass clamp, forecaster decel)
came back negative.  This probe stops toggling semantics and instead
*localizes* the jerk: it runs one batch with per-tick state capture and
reports where |jerk| accumulates — by episode phase (free-flight
acceleration vs braking-to-slot vs merged), by x position, and by
oscillation structure (sign-flip runs = planner flip-flop between
replans; long unidirectional runs = trajectory shape).

Usage: python scripts/st_profile_probe.py --config st_fast --batch 256
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="st_fast")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--out", default=None, help="optional .npz dump")
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/jax_test_cache" if args.platform == "cpu"
                      else "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from rl_mpc_lanemerging_tpu import tasks
    from rl_mpc_lanemerging_tpu.config import Settings
    from rl_mpc_lanemerging_tpu.planner import mpc
    from rl_mpc_lanemerging_tpu.sim.episode import run_episode_batch

    cfg = Settings.load_from_file(f"configs/{args.config}.json").replace(
        BATCH_SCENARIOS=args.batch)
    dt = cfg.TICK_LENGTH

    world = tasks.make_worlds(cfg, batch=args.batch, dtype=jnp.float32)
    from rl_mpc_lanemerging_tpu.ops.st_pallas import LANE_TILE
    force_reference = (args.batch % LANE_TILE != 0) \
        or jax.default_backend() == "cpu"
    controller = mpc.make_batched_controller(
        cfg, force_reference=force_reference)

    run = jax.jit(lambda w: run_episode_batch(
        w, cfg, controller, max_episode_length=cfg.MAX_EPISODE_LENGTH,
        record_history=True))
    w2, stats, hist = jax.block_until_ready(run(world))

    ticks = np.asarray(stats.ticks)                  # (B,)
    merged = np.asarray(stats.merged)
    crashed = np.asarray(stats.crashed)
    ego_x = np.asarray(hist.ego_x, np.float64)       # (B, T+1)
    ego_v = np.asarray(hist.ego_speed, np.float64)
    ego_a = np.asarray(hist.ego_accel, np.float64)

    B, T1 = ego_v.shape
    t_idx = np.arange(T1)[None, :]
    valid = t_idx < ticks[:, None]                   # sensed rows
    # jerk between consecutive sensed states
    jerk = np.diff(ego_a, axis=1) / dt               # (B, T)
    jvalid = (t_idx[:, 1:] < ticks[:, None])
    jerk = np.where(jvalid, jerk, 0.0)

    mean_abs_jerk = np.abs(jerk).sum() / np.maximum(jvalid.sum(), 1)
    print(f"config={args.config} B={B} merged={merged.mean():.4f} "
          f"crashed={crashed.mean():.4f}")
    print(f"recomputed mean |jerk| = {mean_abs_jerk:.3f}  "
          f"(row metric uses per-episode means)")
    per_ep = np.abs(jerk).sum(1) / np.maximum(jvalid.sum(1), 1)
    print(f"per-episode mean |jerk| = {per_ep.mean():.3f}")

    # --- phase split at the peak-speed tick --------------------------------
    v_masked = np.where(valid, ego_v, -1.0)
    peak_tick = v_masked.argmax(axis=1)              # (B,)
    peak_v = v_masked.max(axis=1)
    pre = (t_idx[:, 1:] <= peak_tick[:, None]) & jvalid
    post = (t_idx[:, 1:] > peak_tick[:, None]) & jvalid
    print(f"peak speed: mean {peak_v.mean():.2f}  "
          f"p10/p50/p90 {np.percentile(peak_v, [10, 50, 90])}")
    print(f"peak tick (s): mean {(peak_tick * dt).mean():.2f}  of "
          f"episode {(ticks * dt).mean():.2f}")
    for name, m in [("pre-peak", pre), ("post-peak", post)]:
        n = np.maximum(m.sum(), 1)
        print(f"  {name:9s}: ticks/ep {m.sum() / B:6.1f}  mean|jerk| "
              f"{np.abs(jerk[m]).mean() if m.any() else 0:.3f}  "
              f"share of total |jerk| "
              f"{np.abs(np.where(m, jerk, 0)).sum() / np.abs(jerk).sum():.2%}")

    # --- |jerk| by x -------------------------------------------------------
    x_mid = (ego_x[:, 1:] + ego_x[:, :-1]) / 2
    edges = np.arange(-260, 80, 20)
    print("x-bin       ticks  mean|jerk|  mean_v  mean_a")
    for lo, hi in zip(edges[:-1], edges[1:]):
        m = jvalid & (x_mid >= lo) & (x_mid < hi)
        if m.sum() < 50:
            continue
        print(f"[{lo:4d},{hi:4d})  {m.sum():6d}  {np.abs(jerk[m]).mean():8.3f}"
              f"  {ego_v[:, 1:][m].mean():6.2f}  {ego_a[:, 1:][m].mean():6.2f}")

    # --- oscillation structure --------------------------------------------
    s = np.sign(jerk) * (np.abs(jerk) > 0.25)
    flips = (s[:, 1:] * s[:, :-1] < 0) & jvalid[:, 1:]
    same = (s[:, 1:] * s[:, :-1] > 0) & jvalid[:, 1:]
    print(f"sign-flip ticks/ep {flips.sum() / B:.1f}  "
          f"same-sign ticks/ep {same.sum() / B:.1f}  "
          f"flip |jerk| mass "
          f"{np.abs(np.where(flips, jerk[:, 1:], 0)).sum() / np.abs(jerk).sum():.2%}")
    # |jerk| histogram
    aj = np.abs(jerk[jvalid])
    qs = np.percentile(aj, [50, 75, 90, 95, 99])
    print(f"|jerk| quantiles 50/75/90/95/99: "
          + " ".join(f"{q:.2f}" for q in qs)
          + f"  at-limit(>4.9) frac {(aj > 4.9).mean():.3%}")

    if args.out:
        np.savez(args.out, ego_x=ego_x[:32], ego_v=ego_v[:32],
                 ego_a=ego_a[:32], ticks=ticks[:32], jerk=jerk[:32])
        print(f"dumped first 32 trajectories -> {args.out}")


if __name__ == "__main__":
    main()
