#!/usr/bin/env python
"""Generate the experiment config families.

Reproduces the reference's config taxonomy (reference: configs/README.md and
SURVEY.md C19) from its documented parameters: traffic grid
(interval x speed), seed bands (train 0-2, combined 100-102, cross 200-202,
ddpg-cross 300-302), solver weights from st_default, and the combination
flags (the "b" suffix enables TEST_ST_STRICTLY_BETTER).

Run: python scripts/gen_configs.py [outdir=configs]
"""

import json
import os
import sys

TRAFFIC = {
    # name: (BASE_TRAFFIC_INTERVAL, OTHER_CAR_SPEED)
    "default": (1.2, 7.0),
    "low": (2.4, 7.0),
    "medium": (1.8, 7.0),
    "moderate": (1.2, 11.0),
    "fast": (1.2, 15.0),
}

ST_WEIGHTS = {
    "REWARD_FUNCTION": "Slotted Jerk",
    "CRASH_REWARD": -10,
    "SUCCESS_REWARD": 10,
    "TIME_REWARD": -0.1,
    "ALT_J_WEIGHT": 0.1,
    "S_DISCRETIZATION": 0.05,
    "T_DISCRETIZATION": 0.30,
    "FUTURE_S": 150.0,
    "FUTURE_T": 5.0,
    "START_UNCERTAINTY": 0.0,
    "UNCERTAINTY_PER_SECOND": 0.0,
    "V_WEIGHT": 0.5,
    "A_WEIGHT": 10.0,
    "J_WEIGHT": 10.0,
    "D_WEIGHT": 10.0,
    "MIN_ALLOWED_DISTANCE": 5,
    "CRASH_MIN_S": 20,
}

COMBINATION = {
    "ROLLOUT_LENGTH": 5,
    "ST_TEST_ROLLOUTS": 5,
    "USE_MIN_ALLOWED_DISTANCE_IN_COMBINED_SOLVER": True,
    "LIMIT_DQN_SPEED": False,
    "TEST_ROLLOUT_STATE": True,
    "CHECK_ROLLOUT_CRASH": True,
    "COMBINATION_MIN_DISTANCE": 5.1,
    "STOP_X": 65,
    "REMEMBER_LAST_CHOICE_FOR_SWITCHING_COMBINED": False,
}


def base(task, log_dir, seed, traffic):
    interval, speed = TRAFFIC[traffic]
    cfg = {
        "TASK": task,
        "LOG_DIR": log_dir,
        "NUM_EPISODES": 4000,
        "SEED": seed,
        "BASE_TRAFFIC_INTERVAL": interval,
        "OTHER_CAR_SPEED": speed,
    }
    cfg.update(ST_WEIGHTS)
    return cfg


def main(outdir="configs"):
    os.makedirs(outdir, exist_ok=True)
    out = {}

    # ST solver-only family
    for traffic in TRAFFIC:
        name = f"st_{traffic}"
        out[name] = base("ST", name, 0, traffic)

    # DDPG training family: 3 seeds x 5 traffic types
    for traffic in TRAFFIC:
        for seed in range(3):
            name = f"train_{traffic}_{seed + 1}"
            cfg = base("TRAIN_DDPG", f"ddpg_{traffic}{seed + 1}", seed,
                       traffic)
            out[name] = cfg

    # combined RL+MPC evaluation: seeds 100-102, optional strictly-better
    for traffic in TRAFFIC:
        for seed in range(3):
            for b in ("", "b"):
                name = f"combined_{traffic}_{seed + 1}{b}"
                cfg = base("EVALUATE_COMBINED_DDPG", name, 100 + seed,
                           traffic)
                cfg["MODEL_NAME"] = f"runs/ddpg_{traffic}{seed + 1}_extended"
                cfg.update(COMBINATION)
                cfg["TEST_ST_STRICTLY_BETTER"] = (b == "b")
                out[name] = cfg

    # cross-traffic combined: medium-trained network on other traffic
    for traffic in TRAFFIC:
        if traffic == "medium":
            continue
        tname = "heavy" if traffic == "default" else traffic
        for seed in range(3):
            for b in ("", "b"):
                name = (f"cross_medium_network_{tname}_traffic_"
                        f"{seed + 1}{b}")
                cfg = base("EVALUATE_COMBINED_DDPG", name, 200 + seed,
                           traffic)
                cfg["MODEL_NAME"] = f"runs/ddpg_medium{seed + 1}_extended"
                cfg.update(COMBINATION)
                cfg["TEST_ST_STRICTLY_BETTER"] = (b == "b")
                out[name] = cfg

    # cross-traffic combined, moderate-trained network: the reference's
    # second cross family (saved_data.csv cross_moderate_network_
    # {fast,slow}_traffic_*; its "slow" is the default heavy/slow traffic
    # — reference configs/cross_moderate_network_slow_traffic_1.json has
    # interval 1.2 / speed 7.0)
    for traffic, tname in (("fast", "fast"), ("default", "slow")):
        for seed in range(3):
            for b in ("", "b"):
                name = (f"cross_moderate_network_{tname}_traffic_"
                        f"{seed + 1}{b}")
                cfg = base("EVALUATE_COMBINED_DDPG", name, 200 + seed,
                           traffic)
                cfg["MODEL_NAME"] = \
                    f"runs/ddpg_moderate{seed + 1}_extended"
                cfg.update(COMBINATION)
                cfg["TEST_ST_STRICTLY_BETTER"] = (b == "b")
                out[name] = cfg

    # RL-only cross-traffic evaluation: medium/moderate networks
    for net in ("medium", "moderate"):
        for traffic in TRAFFIC:
            if traffic == net:
                continue
            tname = "heavy" if traffic == "default" else traffic
            for seed in range(3):
                name = (f"ddpg_{net}_network_{tname}_traffic_{seed + 1}")
                cfg = base("EVALUATE_DDPG", name, 300 + seed, traffic)
                cfg["MODEL_NAME"] = f"runs/ddpg_{net}{seed + 1}_extended"
                out[name] = cfg

    for name, cfg in out.items():
        path = os.path.join(outdir, f"{name}.json")
        with open(path, "w") as fh:
            json.dump(cfg, fh, indent=4, sort_keys=True)
    print(f"wrote {len(out)} configs to {outdir}/")


if __name__ == "__main__":
    main(*sys.argv[1:])
