"""Train + record the custom Double-DQN/PER trainer (VERDICT r3 weak 7).

The reference's published rows never use its hand-rolled DQN trainer
(dqn.py:244-359) — its paper rows are DDPG/Rainbow — but the component
exists and ours (agents/dqn.py) was only unit-tested.  This driver runs
the custom trainer end-to-end on default traffic and records a
4000-episode greedy-eval row under LOG_DIR ``dqn_custom_default1`` so the
component has training evidence, not just tests.

Usage: python scripts/train_custom_dqn.py [--episodes-train 20000]
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--episodes-train", type=int, default=20000)
    ap.add_argument("--episodes-eval", type=int, default=4000)
    ap.add_argument("--batch", type=int, default=512)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from rl_mpc_lanemerging_tpu import tasks
    from rl_mpc_lanemerging_tpu.agents import dqn
    from rl_mpc_lanemerging_tpu.config import Settings

    cfg = Settings.load_from_file("configs/train_default_1.json").replace(
        TASK="TRAIN_DQN", LOG_DIR="dqn_custom_default1",
        NUM_EPISODES=args.episodes_eval)
    state = dqn.train(cfg, num_episodes=args.episodes_train)

    eval_cfg = cfg.replace(BATCH_SCENARIOS=args.batch)
    controller = jax.jit(dqn.greedy_controller(state.params, eval_cfg))
    agg = tasks.evaluate_controller(eval_cfg, controller)
    agg.print_stats()
    agg.save_plots(f"runs/{cfg.LOG_DIR}")
    agg.add_csv_data()


if __name__ == "__main__":
    main()
