"""Train + record the tabular Q-learning legacy path (VERDICT r4 missing 3).

The reference's tabular trainer (rl.py:218-304 ``learn_q_model``) runs
NUM_TRAINING_EPISODES fully-random-exploration episodes (epsilon=1.0),
applies the backward per-episode Q update after each, halves STEP_SIZE
every STEP_SIZE_HALF_PER_EPISODES, and finally evaluates greedily with
AVOID_UNVISITED_STATES.  rl/tabular.py implements the table, the
discretizers and the backward update; this driver closes the last gap —
an end-to-end *trained* artifact with a recorded evaluation row.

Batched re-design: B scenarios run synchronized episodes under random
actions (one jitted scan per round, transitions recorded on-device), and
the per-episode backward updates then fold over the batch in a second
scan — order-equivalent to the reference's episode-at-a-time loop, B
episodes per compiled step instead of one per SUMO process.

Usage: python scripts/train_tabular.py [--episodes 30000] [--platform cpu]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--episodes", type=int, default=30000,
                    help="training episodes (reference default 150000; "
                         "the table has 16.2k states and saturates far "
                         "earlier at batched throughput)")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--eval-episodes", type=int, default=2000)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--log-dir", default="tabular_q_default")
    ap.add_argument("--no-csv", action="store_true")
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
    from rl_mpc_lanemerging_tpu.envs.merge_env import (EnvKind, env_reset,
                                                       env_step)
    from rl_mpc_lanemerging_tpu.rl import tabular
    from rl_mpc_lanemerging_tpu.rundir import setup_run_dir

    # the reference tabular path requires the plain Slotted reward
    # (rl.py:269-274 raises on anything else).  The batched JERK env
    # actuates through JERK_VALUES_DQN while the tabular agent's action
    # set is JERK_VALUES (reference rl.py:177-187); the defaults are the
    # same table, but pin them equal so a config overriding either can
    # never silently train Q against the wrong jerk mapping
    base = Settings()
    cfg = base.replace(
        TASK="TRAIN_Q", REWARD_FUNCTION="Slotted", LOG_DIR=args.log_dir,
        TICK_LENGTH=base.TRAINING_TICK_LENGTH,
        JERK_VALUES_DQN=base.JERK_VALUES,
        NUM_EPISODES=args.eval_episodes, BATCH_SCENARIOS=args.batch)
    run = setup_run_dir(cfg, snapshot_src=False)

    B = args.batch
    max_ticks = int(cfg.MAX_EPISODE_LENGTH / cfg.TICK_LENGTH)
    warm = int(20.0 / cfg.TICK_LENGTH)
    T = max_ticks + warm + 2
    n_actions = len(cfg.JERK_VALUES)

    def fresh_env(key):
        worlds = tasks.make_worlds(cfg.replace(SEED="Random"), batch=B,
                                   dtype=jnp.float32)
        worlds = worlds._replace(rng=jax.random.split(key, B))
        return env_reset(worlds, cfg, wait_before_start=20.0)

    @jax.jit
    def collect_round(key, q, visits, step_size):
        """One round: B synchronized random-action episodes + the
        backward Q update folded over the batch."""
        env = fresh_env(key)

        def tick(carry, _):
            env, rng, done = carry
            rng, k = jax.random.split(rng)
            idx6 = jax.vmap(tabular.discretize_state)(env.state)
            action = jax.random.randint(k, (B,), 0, n_actions)
            env, tr = env_step(env, action, cfg, EnvKind.JERK,
                               max_episode_length=cfg.MAX_EPISODE_LENGTH,
                               wait_before_start=20.0)
            # collect only the FIRST episode each scenario runs this
            # round (auto-reset would otherwise splice a second episode
            # into the same slot and corrupt the backward update)
            rec_valid = tr["valid"] & ~done
            done = done | tr["done"]
            rec = (jnp.stack(idx6), action, tr["reward"], rec_valid)
            return (env, rng, done), rec

        (_, _, _), recs = jax.lax.scan(
            tick, (env, key, jnp.zeros((B,), bool)), None, length=T)
        idx6_t, actions_t, rewards_t, valid_t = recs   # (T, ...) stacks

        def fold(carry, ep):
            q, visits = carry
            idx6, actions, rewards, valid = ep
            q, visits = tabular.q_update_episode(
                q, visits, tuple(idx6), actions, rewards, valid,
                cfg.GAMMA, step_size)
            return (q, visits), None

        # (T, 6, B) -> (B, 6, T): scan folds the B episodes sequentially
        eps = (jnp.transpose(idx6_t, (2, 1, 0)),
               actions_t.T, rewards_t.T, valid_t.T)
        (q, visits), _ = jax.lax.scan(fold, (q, visits), eps)
        return q, visits

    q = tabular.initialize_q(cfg)
    visits = tabular.initialize_q(cfg)
    key = jax.random.PRNGKey(0)
    step_size = float(cfg.STEP_SIZE)
    episodes_done = 0
    t0 = time.time()
    rounds = (args.episodes + B - 1) // B
    for r in range(rounds):
        key, k = jax.random.split(key)
        q, visits = collect_round(k, q, visits, step_size)
        episodes_done += B
        # STEP_SIZE halving cadence (rl.py:300-301)
        halvings = episodes_done // cfg.STEP_SIZE_HALF_PER_EPISODES
        step_size = float(cfg.STEP_SIZE) / (2.0 ** halvings)
        if (r + 1) % 10 == 0 or r == rounds - 1:
            q = jax.block_until_ready(q)
            nz = int(jnp.count_nonzero(visits))
            print(f"round {r + 1}/{rounds} episodes={episodes_done} "
                  f"visited_sa={nz}/{visits.size} "
                  f"({time.time() - t0:.0f}s)", flush=True)
            run.log_scalars(episodes_done,
                            {"visited_sa": nz, "step_size": step_size})

    np.save(f"runs/{cfg.LOG_DIR}/q.npy", np.asarray(q))
    np.save(f"runs/{cfg.LOG_DIR}/visits.npy", np.asarray(visits))
    print(f"saved Q table -> runs/{cfg.LOG_DIR}/q.npy")

    # greedy eval at the evaluation tick (rl.py:245-260)
    eval_cfg = cfg.replace(TICK_LENGTH=cfg.EVALUATION_TICK_LENGTH)
    controller = jax.jit(tabular.greedy_tabular_controller(
        q, visits, eval_cfg))
    agg = tasks.evaluate_controller(
        eval_cfg, controller, num_episodes=args.eval_episodes,
        max_episode_length=cfg.EVALUATION_EPISODE_LENGTH)
    agg.print_stats()
    agg.save_plots(f"runs/{cfg.LOG_DIR}")
    if not args.no_csv:
        agg.add_csv_data()


if __name__ == "__main__":
    main()
