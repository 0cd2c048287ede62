"""Finish the interrupted ddpg_moderate1 pipeline.

The base TRAIN_DDPG run of configs/train_moderate_1.json completed and
saved runs/ddpg_moderate1/params, but the session died mid-way through the
lr/10 "_extended" half (reference ddpg.py:96-117).  This re-runs exactly
the extended branch of agents.ddpg.train() from the saved base params,
then the final EVALUATE_DDPG, appending the ddpg_moderate1 row to
run_data.csv.
"""
import sys

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from rl_mpc_lanemerging_tpu import tasks
from rl_mpc_lanemerging_tpu.agents import ddpg
from rl_mpc_lanemerging_tpu.checkpoint import load_params, save_params
from rl_mpc_lanemerging_tpu.config import Settings
from rl_mpc_lanemerging_tpu.rundir import setup_run_dir


def main():
    cfg = Settings.load_from_file("configs/train_moderate_1.json")
    base = load_params("runs/ddpg_moderate1")
    rng = jax.random.split(tasks.seed_key(cfg))[0]

    lr2 = cfg.LEARNING_RATE / 10.0
    cfg2 = cfg.replace(LOG_DIR=cfg.LOG_DIR + "_extended")
    run2 = setup_run_dir(cfg2, snapshot_src=False)
    state2 = ddpg.make_train_state(
        cfg2, tasks.make_worlds(cfg2), rng, lr=lr2,
        init_params=(base["actor"], base["critic"]))
    print(f"DDPG extended (resume): 1e6 frames at lr={lr2}", flush=True)
    state2 = ddpg._train_frames(cfg2, state2, 1e6, lr2, True, run=run2,
                                eval_every_rounds=8)
    save_params(run2.path, {"actor": state2.actor_params,
                            "critic": state2.critic_params})
    ddpg.evaluate(cfg, params=state2.actor_params)


if __name__ == "__main__":
    main()
