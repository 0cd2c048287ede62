"""Crash forensics for the residual nonzero-crash combined rows
(VERDICT r5 item 4: cross_moderate_network_slow_traffic_2/2b are the
last reference zero-crash configs we record at ~0.001).

Runs the combined-arbiter evaluation with per-tick state capture and
crash dumping enabled (the TASK="ST" forensics path, tasks.py:103-111,
wired through the combined controller), then replays every dump through
the solver to classify each crash: did the safety certificate ever
condemn a pre-crash state (arbiter-gate miss) or does the solver see a
feasible path to the end (policy steers into an unforecastable
situation — sim-microsemantics / forecaster blind spot)?

Usage: python scripts/combined_crash_forensics.py \
    --config cross_moderate_network_slow_traffic_2 --episodes 2000
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="cross_moderate_network_slow_traffic_2")
    ap.add_argument("--episodes", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=512)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from rl_mpc_lanemerging_tpu import tasks
    from rl_mpc_lanemerging_tpu.agents import ddpg
    from rl_mpc_lanemerging_tpu.agents.combined import combined_controller
    from rl_mpc_lanemerging_tpu.config import Settings
    from rl_mpc_lanemerging_tpu.forensics import replay_crash

    cfg = Settings.load_from_file(f"configs/{args.config}.json").replace(
        NUM_EPISODES=args.episodes, BATCH_SCENARIOS=args.batch)
    out_dir = f"runs/{cfg.LOG_DIR}/forensics"
    os.makedirs(out_dir, exist_ok=True)

    params = ddpg._load_actor(cfg)
    policy = ddpg.actor_jerk(params, cfg)
    controller, init_carry, takeover_stats = combined_controller(policy, cfg)
    carry = init_carry(cfg.BATCH_SCENARIOS) if init_carry else None
    agg = tasks.evaluate_controller(
        cfg, controller, num_episodes=args.episodes,
        custom_stats=takeover_stats, controller_carry=carry,
        save_state_on_crash=True, run_dir=out_dir, verbose=True)
    avg = agg.get_stat_averages()
    print(f"eval: crash={avg['crashed']:.4f} merge={avg['merged']:.4f} "
          f"episodes={args.episodes}")

    dumps = sorted(glob.glob(os.path.join(out_dir, "*.pkl")))
    print(f"{len(dumps)} crash dumps")
    for d in dumps:
        doomed, _ = replay_crash(d, cfg, out_dir=out_dir)
        n = len(doomed)
        first_doomed = next((i for i, x in enumerate(doomed) if x), None)
        print(f"  {os.path.basename(d)}: {n} pre-crash states; "
              f"solver-condemned from state "
              f"{first_doomed if first_doomed is not None else 'NEVER'}"
              f" ({sum(doomed)}/{n} condemned)")


if __name__ == "__main__":
    main()
