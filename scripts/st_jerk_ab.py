"""One-variable A/B attribution of the sparse-traffic ST jerk gap.

VERDICT r3 item 6: our st_fast mean_abs_jerk is 1.592 vs the reference's
1.153 (st_moderate 1.492 vs 1.280) while every speed-7 traffic config
matches within ~2%, pointing at a fast-traffic sim micro-semantic.  This
study evaluates TASK="ST" on st_fast (and optionally st_moderate) with
exactly one semantic toggled per run:

  baseline        production semantics
  yield_always    highway cars always yield to the merged ego
                  (drops the can-yield kinematic gate, world.py)
  yield_never     highway cars always assert priority
  no_pass_off     follower-never-passes-leader clamp removed
  pred_decel_0    forecaster reactive deceleration disabled
                  (MAX_PREDICTED_DECELERATION=0: pure constant-velocity)
  pred_decel_2x   forecaster reactive deceleration doubled

Writes STUDY_ST_JERK.md with one row per variant (no run_data.csv rows —
these are diagnostics, not acceptance evidence).

Usage: python scripts/st_jerk_ab.py [--config st_fast] [--episodes 2000]
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="st_fast")
    ap.add_argument("--episodes", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--platform", default=None,
                    help="force a JAX platform (cpu runs concurrently "
                         "with TPU queues; the portable dense solver is "
                         "differential-tested against the Pallas path)")
    ap.add_argument("--out", default="STUDY_ST_JERK.md")
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/jax_test_cache" if args.platform == "cpu"
                      else "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from rl_mpc_lanemerging_tpu import tasks
    from rl_mpc_lanemerging_tpu.config import Settings

    base = Settings.load_from_file(f"configs/{args.config}.json").replace(
        NUM_EPISODES=args.episodes, BATCH_SCENARIOS=args.batch)

    variants = {
        "baseline": {},
        "yield_always": {"DIAG_YIELD_MODE": "always"},
        "yield_never": {"DIAG_YIELD_MODE": "never"},
        "no_pass_off": {"DIAG_NO_PASS_CLAMP_OFF": True},
        "pred_decel_0": {"MAX_PREDICTED_DECELERATION": 0.0},
        "pred_decel_2x": {"MAX_PREDICTED_DECELERATION":
                          2.0 * base.MAX_PREDICTED_DECELERATION},
    }

    rows = []
    for name, over in variants.items():
        cfg = base.replace(**over)
        print(f"=== {name} {over} ===", flush=True)
        agg = tasks.evaluate_st(cfg, verbose=False)
        avg = agg.get_stat_averages()
        rows.append((name, over, avg))
        print(f"  crash={avg['crashed']:.4f} jerk={avg['mean_abs_jerk']:.3f} "
              f"t-merge={avg['time_to_merge']:.2f} "
              f"disrupt={avg['mean_disruption']:.3f}", flush=True)

    ref = {"st_fast": (1.153, 14.48), "st_moderate": (1.280, 20.34),
           "st_low": (1.074, 25.66), "st_default": (1.105, 29.84),
           "st_medium": (1.262, 28.64)}
    rj, rt = ref.get(args.config, (float("nan"), float("nan")))
    lines = [
        f"# ST jerk A/B study — {args.config} "
        f"({args.episodes} episodes/variant)", "",
        f"Reference: mean_abs_jerk {rj}, time_to_merge {rt} "
        f"(saved_data.csv).  One semantic toggled per run; baseline is "
        f"the production sim.", "",
        "| variant | override | crash | merge | jerk | t-merge | "
        "mean disruption |",
        "|---|---|---|---|---|---|---|",
    ]
    for name, over, avg in rows:
        lines.append(
            f"| {name} | `{over or '-'}` | {avg['crashed']:.4f} | "
            f"{avg['merged']:.4f} | {avg['mean_abs_jerk']:.3f} | "
            f"{avg['time_to_merge']:.2f} | {avg['mean_disruption']:.3f} |")
    with open(args.out, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
