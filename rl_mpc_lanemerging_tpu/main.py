"""CLI entry point: ``python -m rl_mpc_lanemerging_tpu.main configs/x.json``.

Mirrors the reference's task dispatcher (reference: main.py:16-40, 84-102):
load a JSON config, seed, and dispatch on TASK.  RL tasks are filled in by
the agents package; quirks of the reference dispatcher are preserved
(EVALUATE_COMBINED_DQN loads a DDPG agent, main.py:35-37).
"""

from __future__ import annotations

import argparse
import logging

from .config import Settings


def do_task(cfg: Settings) -> None:
    task = cfg.TASK
    if task == "ST":
        from . import tasks
        agg = tasks.evaluate_st(cfg)
        agg.add_csv_data()
    elif task in ("TRAIN_DQN", "RESUME_DQN"):
        from .agents import rainbow as rainbow_agent
        rainbow_agent.train(cfg, resume=(task == "RESUME_DQN"))
    elif task in ("TRAIN_DDPG", "RESUME_DDPG"):
        from .agents import ddpg as ddpg_agent
        ddpg_agent.train(cfg, resume=(task == "RESUME_DDPG"))
    elif task == "EVALUATE_DQN":
        from .agents import rainbow as rainbow_agent
        rainbow_agent.evaluate(cfg)
    elif task == "EVALUATE_DDPG":
        from .agents import ddpg as ddpg_agent
        ddpg_agent.evaluate(cfg)
    elif task in ("EVALUATE_COMBINED_DQN", "EVALUATE_COMBINED_DDPG"):
        # reference quirk: both load the DDPG agent (main.py:35-40)
        from .agents import ddpg as ddpg_agent
        ddpg_agent.evaluate_combined(cfg)
    else:
        raise ValueError(f"Unknown TASK: {task}")


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(
        description="TPU-native RL+MPC lane-merging framework")
    parser.add_argument("config", nargs="?", default=None,
                        help="JSON settings file (reference format)")
    parser.add_argument("--episodes", type=int, default=None,
                        help="override NUM_EPISODES")
    parser.add_argument("--batch", type=int, default=None,
                        help="override BATCH_SCENARIOS")
    parser.add_argument("--platform", default=None,
                        help="force a JAX platform (e.g. cpu, tpu); by "
                             "default the ambient accelerator is used")
    args = parser.parse_args(argv)

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    cfg = Settings() if args.config is None \
        else Settings.load_from_file(args.config)
    if args.episodes is not None:
        cfg = cfg.replace(NUM_EPISODES=args.episodes)
    if args.batch is not None:
        cfg = cfg.replace(BATCH_SCENARIOS=args.batch)

    logging.basicConfig(level=cfg.LOG_LEVEL)
    do_task(cfg)


if __name__ == "__main__":
    main()
