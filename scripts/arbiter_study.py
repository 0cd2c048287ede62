"""Arbiter-activity parity study (VERDICT r3 item 2).

The reference's combined RL+MPC arbiter takes over 3.2-15.8% of ticks
(saved_data.csv "percent st solver"; combined_moderate_1 = 0.0374) while
ours fired 50x less on some configs (combined_moderate_1 = 0.0007).
Crash/merge match exactly (0.0/1.0), so the question is *why* the ST
solver is consulted less: policy quality (our retrained DDPG policies are
smoother/safer than the reference's, so the certificate gates rarely
trigger) vs gate calibration (our gates are too lax).

Two experiments on one config family:

1. policy ladder — the SAME combined config evaluated over policies of
   descending quality: the final extended policy, the stage-1 (pre-lr-
   drop) policy, and a deliberately weak early policy trained for only
   ~60k frames.  If percent-ST rises as the policy worsens (with crash
   still ~0), the under-firing is a property of policy quality, not a
   broken gate.
2. gate sweep — the production policy with each certificate knob
   tightened one at a time (ST_TEST_ROLLOUTS earlier/later test state,
   COMBINATION_MIN_DISTANCE safety margin, ROLLOUT_LENGTH horizon,
   TEST_ROLLOUT_STATE off as a control).  Shows which knob recovers
   reference-level takeover (~3-4%) and at what jerk cost.

Writes ARBITER_STUDY.md.  Diagnostics only — no run_data.csv rows.

Usage: python scripts/arbiter_study.py [--family moderate] [--episodes 2000]
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")


def eval_combined(cfg, params, episodes):
    import jax

    from rl_mpc_lanemerging_tpu import tasks
    from rl_mpc_lanemerging_tpu.agents.combined import combined_controller
    from rl_mpc_lanemerging_tpu.agents.ddpg import actor_jerk

    policy = actor_jerk(params, cfg)
    controller, init_carry, takeover_stats = combined_controller(policy, cfg)
    carry = init_carry(cfg.BATCH_SCENARIOS) if init_carry else None
    agg = tasks.evaluate_controller(
        cfg, controller, num_episodes=episodes, verbose=False,
        custom_stats=takeover_stats, controller_carry=carry)
    return agg.get_stat_averages()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", default="moderate")
    ap.add_argument("--episodes", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--weak-frames", type=float, default=60000)
    ap.add_argument("--platform", default=None,
                    help="force a JAX platform (cpu runs concurrently "
                         "with TPU queues; the portable dense solver is "
                         "differential-tested against the Pallas path)")
    ap.add_argument("--out", default="ARBITER_STUDY.md")
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/jax_test_cache" if args.platform == "cpu"
                      else "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from rl_mpc_lanemerging_tpu import tasks
    from rl_mpc_lanemerging_tpu.agents import ddpg
    from rl_mpc_lanemerging_tpu.checkpoint import load_params
    from rl_mpc_lanemerging_tpu.config import Settings

    fam = args.family
    cfg = Settings.load_from_file(f"configs/combined_{fam}_1.json").replace(
        BATCH_SCENARIOS=args.batch)

    # --- policy ladder -------------------------------------------------
    print("training weak policy...", flush=True)
    tr_cfg = Settings.load_from_file(f"configs/train_{fam}_1.json").replace(
        LOG_DIR=f"arbiter_weak_{fam}")
    worlds = tasks.make_worlds(tr_cfg)
    state = ddpg.make_train_state(tr_cfg, worlds, tasks.seed_key(tr_cfg),
                                  lr=tr_cfg.LEARNING_RATE)
    state = ddpg._train_frames(tr_cfg, state, args.weak_frames,
                               tr_cfg.LEARNING_RATE, verbose=True)
    ladder = [
        ("extended (production)",
         load_params(f"runs/ddpg_{fam}1_extended")["actor"]),
        ("stage-1 (pre lr-drop)", load_params(f"runs/ddpg_{fam}1")["actor"]),
        (f"weak ({int(args.weak_frames)} frames)", state.actor_params),
    ]
    ladder_rows = []
    for name, params in ladder:
        avg = eval_combined(cfg, params, args.episodes)
        ladder_rows.append((name, avg))
        print(f"  {name}: pct_st={avg['percent st solver']:.4f} "
              f"crash={avg['crashed']:.4f} jerk={avg['mean_abs_jerk']:.3f}",
              flush=True)

    # --- gate sweep on the production policy --------------------------
    prod = ladder[0][1]
    sweeps = [
        ("production gates", {}),
        ("TEST_ROLLOUT_STATE off", {"TEST_ROLLOUT_STATE": False}),
        ("ST_TEST_ROLLOUTS=2", {"ST_TEST_ROLLOUTS": 2}),
        ("ST_TEST_ROLLOUTS=10, ROLLOUT_LENGTH=10",
         {"ST_TEST_ROLLOUTS": 10, "ROLLOUT_LENGTH": 10}),
        ("COMBINATION_MIN_DISTANCE=6.5", {"COMBINATION_MIN_DISTANCE": 6.5}),
        ("COMBINATION_MIN_DISTANCE=8.0", {"COMBINATION_MIN_DISTANCE": 8.0}),
        ("strictly-better gate on", {"TEST_ST_STRICTLY_BETTER": True}),
    ]
    sweep_rows = []
    for name, over in sweeps:
        avg = eval_combined(cfg.replace(**over), prod, args.episodes)
        sweep_rows.append((name, over, avg))
        print(f"  {name}: pct_st={avg['percent st solver']:.4f} "
              f"crash={avg['crashed']:.4f} jerk={avg['mean_abs_jerk']:.3f}",
              flush=True)

    # reference saved_data.csv "percent st solver" for combined_<fam>_1
    ref_pct = {"default": 0.0349, "moderate": 0.0374, "low": 0.0323,
               "medium": 0.0238, "fast": 0.0721}
    lines = [
        f"# Arbiter-activity study — combined_{fam}_1 "
        f"({args.episodes} episodes/cell)", "",
        f"Reference percent-ST for this config: "
        f"~{ref_pct.get(fam, float('nan'))} (saved_data.csv "
        f"'percent st solver').", "",
        "## Policy-quality ladder (same gates, weaker policies)", "",
        "| policy | percent ST | crash | merge | jerk |",
        "|---|---|---|---|---|",
    ]
    for name, avg in ladder_rows:
        lines.append(f"| {name} | {avg['percent st solver']:.4f} | "
                     f"{avg['crashed']:.4f} | {avg['merged']:.4f} | "
                     f"{avg['mean_abs_jerk']:.3f} |")
    lines += ["", "## Gate sweep (production policy)", "",
              "| gates | override | percent ST | crash | merge | jerk |",
              "|---|---|---|---|---|---|"]
    for name, over, avg in sweep_rows:
        lines.append(f"| {name} | `{over or '-'}` | "
                     f"{avg['percent st solver']:.4f} | "
                     f"{avg['crashed']:.4f} | {avg['merged']:.4f} | "
                     f"{avg['mean_abs_jerk']:.3f} |")
    with open(args.out, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
