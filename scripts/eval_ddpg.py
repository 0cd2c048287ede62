"""Re-record an EVALUATE_DDPG row for an already-trained policy.

Usage: python scripts/eval_ddpg.py <family> <seed> [--episodes N] [--batch B]

Builds the eval config from the matching train config (the reference's
in-distribution ddpg rows come from the training pipeline's final
``agent.evaluate`` call, reference ddpg.py:114-117) and points MODEL_NAME
at the trained ``runs/ddpg_<family><seed>_extended`` checkpoint.
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("family")
    ap.add_argument("seed", type=int)
    ap.add_argument("--episodes", type=int, default=4000)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--log-dir", default=None,
                    help="override the recorded LOG_DIR (e.g. the "
                         "reference's oddball ddpg_evaluate_low_2_4000)")
    args = ap.parse_args()

    from rl_mpc_lanemerging_tpu.config import Settings
    cfg = Settings.load_from_file(f"configs/train_{args.family}_{args.seed}.json")
    name = args.log_dir or f"ddpg_{args.family}{args.seed}_extended"
    cfg = cfg.replace(TASK="EVALUATE_DDPG",
                      MODEL_NAME=f"runs/ddpg_{args.family}{args.seed}_extended",
                      LOG_DIR=name,
                      NUM_EPISODES=args.episodes,
                      BATCH_SCENARIOS=args.batch)
    from rl_mpc_lanemerging_tpu.agents import ddpg
    ddpg.evaluate(cfg)


if __name__ == "__main__":
    main()
