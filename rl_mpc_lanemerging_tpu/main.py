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


def do_task(cfg: Settings, num_frames: float = 1e6,
            record_csv: bool = True) -> None:
    task = cfg.TASK
    from .rundir import setup_run_dir
    setup_run_dir(cfg, snapshot_src=task.startswith(("TRAIN", "RESUME")))
    if task == "ST":
        from . import tasks
        agg = tasks.evaluate_st(cfg)
        if record_csv:
            agg.add_csv_data()
    elif task in ("TRAIN_DQN", "RESUME_DQN"):
        from .agents import rainbow as rainbow_agent
        rainbow_agent.train(cfg, num_frames=num_frames,
                            resume=(task == "RESUME_DQN"),
                            record_csv=record_csv)
    elif task in ("TRAIN_DDPG", "RESUME_DDPG"):
        from .agents import ddpg as ddpg_agent
        ddpg_agent.train(cfg, num_frames=num_frames,
                         resume=(task == "RESUME_DDPG"),
                         record_csv=record_csv)
    elif task == "EVALUATE_DQN":
        from .agents import rainbow as rainbow_agent
        rainbow_agent.evaluate(cfg, record_csv=record_csv)
    elif task == "EVALUATE_DDPG":
        from .agents import ddpg as ddpg_agent
        ddpg_agent.evaluate(cfg, record_csv=record_csv)
    elif task in ("EVALUATE_COMBINED_DQN", "EVALUATE_COMBINED_DDPG"):
        # reference quirk: both load the DDPG agent (main.py:35-40)
        from .agents import ddpg as ddpg_agent
        ddpg_agent.evaluate_combined(cfg, record_csv=record_csv)
    else:
        raise ValueError(f"Unknown TASK: {task}")


def do_grid_search_st(cfg: Settings) -> None:
    """ST-weight grid search (reference main.py:43-59): every combination
    of solver weights runs the configured task; each run appends its own
    run_data.csv row, so the grid is analyzed from the CSV exactly like the
    reference's."""
    import itertools
    search_grid = {
        "V_WEIGHT": [0.5, 1.0],
        "A_WEIGHT": [0.0, 10.0],
        "J_WEIGHT": [0.0, 10.0, 50.0],
        "D_WEIGHT": [0.0, 10.0, 100.0, 1000.0],
        "MIN_ALLOWED_DISTANCE": [5, 6],
        "CRASH_MIN_S": [10, 15, 20],
    }
    for values in itertools.product(*search_grid.values()):
        do_task(cfg.replace(**dict(zip(search_grid.keys(), values))))


def do_grid_search_combined(cfg: Settings) -> None:
    """Combination-hyperparameter grid search (reference main.py:62-81),
    including the reference's pruning rules."""
    import itertools
    search_grid = {
        "ROLLOUT_LENGTH": [3, 5, 10, 20],
        "ST_TEST_ROLLOUTS": [2, 5, 10],
        "TEST_ROLLOUT_STATE": [True, False],
    }
    for values in itertools.product(*search_grid.values()):
        c = cfg.replace(**dict(zip(search_grid.keys(), values)))
        if not c.TEST_ROLLOUT_STATE and c.ST_TEST_ROLLOUTS != 2:
            continue
        if c.ROLLOUT_LENGTH == 1 and c.ST_TEST_ROLLOUTS != 2:
            continue
        if c.ST_TEST_ROLLOUTS > c.ROLLOUT_LENGTH:
            continue
        do_task(c)


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(
        description="TPU-native RL+MPC lane-merging framework")
    parser.add_argument("config", nargs="?", default=None,
                        help="JSON settings file (reference format)")
    parser.add_argument("--episodes", type=int, default=None,
                        help="override NUM_EPISODES")
    parser.add_argument("--batch", type=int, default=None,
                        help="override BATCH_SCENARIOS")
    parser.add_argument("--frames", type=float, default=1e6,
                        help="frame budget per training stage (TRAIN_* "
                             "tasks; the reference trains 1e6 + 1e6 "
                             "extended, reference ddpg.py:96-102)")
    parser.add_argument("--platform", default=None,
                        help="force a JAX platform (e.g. cpu, tpu); by "
                             "default the ambient accelerator is used")
    parser.add_argument("--grid-search", choices=["st", "combined"],
                        default=None,
                        help="sweep the reference's ST-weight or "
                             "combination grids around the loaded config "
                             "(reference main.py:43-81)")
    parser.add_argument("--no-csv", action="store_true",
                        help="skip the run_data.csv row (smoke/verify "
                             "runs must not pollute the experiment "
                             "database)")
    args = parser.parse_args(argv)

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    # multi-host (DCN) plumbing: JAX_COORDINATOR/JAX_NUM_PROCESSES/
    # JAX_PROCESS_ID env vars turn this process into one rank of an N-host
    # mesh (SURVEY §2.3; the reference is strictly single-process)
    from .parallel.sharded import maybe_initialize_distributed
    maybe_initialize_distributed()

    cfg = Settings() if args.config is None \
        else Settings.load_from_file(args.config)
    if args.episodes is not None:
        cfg = cfg.replace(NUM_EPISODES=args.episodes)
    if args.batch is not None:
        cfg = cfg.replace(BATCH_SCENARIOS=args.batch)

    logging.basicConfig(level=cfg.LOG_LEVEL)
    if args.grid_search == "st":
        do_grid_search_st(cfg)
    elif args.grid_search == "combined":
        do_grid_search_combined(cfg)
    else:
        do_task(cfg, num_frames=args.frames,
                record_csv=not args.no_csv)


if __name__ == "__main__":
    main()
