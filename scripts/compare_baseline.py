#!/usr/bin/env python
"""Compare run_data.csv rows against the reference's saved_data.csv.

Matches rows by LOG_DIR (ours) to the reference experiment rows
(/root/reference/experiment_data/saved_data.csv — the paper's full result
set) and prints ours-vs-reference for the headline metrics, with the
reference's own SEMs as tolerance context.  Writes ACCEPTANCE.md.
"""

import sys

import numpy as np
import pandas as pd

METRICS = ["crashed", "merged", "mean_abs_jerk", "time_to_merge",
           "mean_speed", "closest_distance", "clock_time_per_step"]

# our LOG_DIR -> reference LOG_DIR (the reference logs eval runs under the
# model/run name in its LOG_DIR column)
NAME_MAP = {}
for _t in ("default", "low", "medium", "moderate", "fast"):
    for _s in (1, 2, 3):
        # our TRAIN_* trailing eval logs under the train LOG_DIR; the
        # reference's in-distribution eval rows carry the _extended name
        NAME_MAP[f"ddpg_{_t}{_s}"] = f"ddpg_{_t}{_s}_extended"
for _s in (1, 2, 3):
    # reference CSV used "slow_traffic" for what its configs call low
    NAME_MAP[f"ddpg_moderate_network_low_traffic_{_s}"] = \
        f"ddpg_moderate_network_slow_traffic_{_s}"


def best_reference_row(ref: pd.DataFrame, log_dir: str):
    """Reference rows keyed by LOG_DIR; prefer the highest-episode row."""
    cand = ref[ref["LOG_DIR"] == NAME_MAP.get(log_dir, log_dir)]
    if cand.empty:
        return None
    return cand.sort_values("NUM_EPISODES").iloc[-1]


def main(run_path="run_data.csv",
         ref_path="/root/reference/experiment_data/saved_data.csv",
         out_path="ACCEPTANCE.md"):
    ours = pd.read_csv(run_path)
    # one row per config: the latest full-scale run (>= 1000 episodes)
    ours = ours[ours["NUM_EPISODES"] >= 1000]
    ours = ours.groupby("LOG_DIR", as_index=False).last()
    ref = pd.read_csv(ref_path)
    lines = ["# ACCEPTANCE — ours vs reference (saved_data.csv)", "",
             "One row per config: the latest >= 1000-episode run in "
             "run_data.csv vs the reference's highest-episode row. "
             "clock_time_per_step compares TPU batch-amortized wall clock "
             "to the reference's single-scenario CPU wall clock.", "",
             "| config | metric | ours | reference | ref SEM | Δ |",
             "|---|---|---|---|---|---|"]
    print(f"{'config':38s} {'metric':22s} {'ours':>10s} {'ref':>10s} "
          f"{'Δ':>9s}")
    for _, row in ours.iterrows():
        log_dir = row.get("LOG_DIR", "?")
        r = best_reference_row(ref, log_dir)
        if r is None:
            continue
        for m in METRICS:
            if m not in row or m not in r or pd.isna(row[m]) \
                    or pd.isna(r[m]):
                continue
            ref_sem = r.get(m + "_std", np.nan)
            delta = row[m] - r[m]
            print(f"{log_dir:38s} {m:22s} {row[m]:10.4f} {r[m]:10.4f} "
                  f"{delta:+9.4f}")
            lines.append(f"| {log_dir} | {m} | {row[m]:.4f} | {r[m]:.4f} "
                         f"| {ref_sem if pd.isna(ref_sem) else round(ref_sem, 4)} "
                         f"| {delta:+.4f} |")
        print()
        lines.append("| | | | | | |")
    with open(out_path, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main(*sys.argv[1:])
