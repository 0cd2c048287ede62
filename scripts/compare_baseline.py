#!/usr/bin/env python
"""Compare run_data.csv rows against the reference's saved_data.csv.

Matches rows by LOG_DIR (ours) to the reference experiment rows
(/root/reference/experiment_data/saved_data.csv — the paper's full result
set) and writes ACCEPTANCE.md: a per-family ours-vs-reference table over
the headline metrics, with the reference's own SEMs as tolerance context,
plus a coverage list of reference rows we have no counterpart for.
"""

import sys

import numpy as np
import pandas as pd

METRICS = ["crashed", "merged", "mean_abs_jerk", "time_to_merge",
           "clock_time_per_step"]

# our LOG_DIR -> reference LOG_DIR (the reference logs eval runs under the
# model/run name in its LOG_DIR column)
NAME_MAP = {}
for _t in ("default", "low", "medium", "moderate", "fast"):
    for _s in (1, 2, 3):
        # our TRAIN_* trailing eval logs under the train LOG_DIR; the
        # reference's in-distribution eval rows carry the _extended name
        NAME_MAP[f"ddpg_{_t}{_s}"] = f"ddpg_{_t}{_s}_extended"
# NOTE: ddpg_moderate_network_slow_traffic_* (interval 1.2, speed 7)
# now has its own configs; it is NOT the same traffic as our
# *_low_traffic_* (interval 2.4) and must not be name-mapped to it.


def family(log_dir: str) -> str:
    for fam in ("st_", "combined_", "cross_", "ddpg_"):
        if log_dir.startswith(fam):
            return fam.rstrip("_")
    return "other"


def best_reference_row(ref: pd.DataFrame, log_dir: str):
    """Reference rows keyed by LOG_DIR; prefer the highest-episode row."""
    cand = ref[ref["LOG_DIR"] == NAME_MAP.get(log_dir, log_dir)]
    if cand.empty:
        return None
    return cand.sort_values("NUM_EPISODES").iloc[-1]


def fmt(x, nd=4):
    return "—" if pd.isna(x) else f"{x:.{nd}f}"


def main(run_path="run_data.csv",
         ref_path="/root/reference/experiment_data/saved_data.csv",
         out_path="ACCEPTANCE.md"):
    ours = pd.read_csv(run_path)
    # one row per config: the latest full-scale run (>= 1000 episodes)
    ours = ours[ours["NUM_EPISODES"] >= 1000]
    ours = ours.groupby("LOG_DIR", as_index=False).last()
    ref = pd.read_csv(ref_path)

    matched, missing = [], []
    for _, row in ours.iterrows():
        r = best_reference_row(ref, row["LOG_DIR"])
        if r is not None:
            matched.append((row["LOG_DIR"], row, r))
    matched_ref_names = {NAME_MAP.get(n, n) for n, _, _ in matched}
    for rname in sorted(set(ref["LOG_DIR"])):
        if rname not in matched_ref_names:
            missing.append(rname)

    lines = [
        "# ACCEPTANCE — ours vs reference (saved_data.csv)", "",
        "One row per config: the latest >= 1000-episode run in "
        "run_data.csv vs the reference's highest-episode row "
        "(reference SEM in parentheses under crash).  "
        "clock_time_per_step compares TPU batch-amortized wall clock to "
        "the reference's single-scenario 1-core CPU wall clock; the "
        "ratio column is reference/ours (x faster).", "",
        "Provenance note: every DDPG policy was retrained in round 4 "
        "under the current sim semantics with best-eval snapshot "
        "selection (1e6+1e6 frames, the reference's budget); the row "
        "shown per LOG_DIR is the latest, i.e. post-retrain where a "
        "rerun exists.  Earlier rows in run_data.csv (kept append-only "
        "like the reference's) include legacy-checkpoint evals that "
        "measured the round-2->3 semantics drift.", "",
        "Known deviations (flagged per-row in the Δ>10% column): "
        "(1) *ST jerk on sparse/fast traffic* — the planning pipeline "
        "is proven element-identical to the reference's code "
        "(STUDY_ST_JERK_PIPELINE.md); the residual +8-38% mean |jerk| "
        "on st_fast/st_moderate/st_low traces to the re-designed sim "
        "backend's traffic microdynamics, with crash/merge/t-merge "
        "unaffected.  (2) *Arbiter activity on moderate traffic* — our "
        "recorded combined_moderate rows carry percent-ST ~0.0005 vs "
        "the reference's 0.0374; ARBITER_STUDY.md attributes this to "
        "policy quality (a 17x policy-ladder effect) and shows "
        "COMBINATION_MIN_DISTANCE 6.5 reproduces the reference's "
        "takeover rate at zero crash.  (3) *Time-to-merge on low "
        "traffic* — policies selected by the pre-r5 time-blind "
        "snapshot score merge slower than the reference's; r5 retrains "
        "under the time-aware score close this (see flagged rows).  "
        "(4) *Residual ~0.001-0.006 crash on the cross_moderate rows "
        "(slow_traffic_2/2b, fast_traffic_1/1b)* — crash forensics "
        "(scripts/combined_crash_forensics.py: slow_2 3 dumps / 2000 "
        "episodes, fast_1 11 dumps / 2000 episodes, every dump "
        "replayed through the solver) classifies every crash as a "
        "one-tick trap: the safety certificate condemns the state only "
        "0.75-2.25 s before impact (fast_1: condemned from tick 47-67 "
        "of 53-75, never earlier), i.e. each preceding state still "
        "admitted a feasible trajectory, so the arbiter correctly let "
        "the policy drive until the trap formed faster than its "
        "one-step lookahead — the same policy-risk mechanism and "
        "magnitude the reference itself records on the neighboring seed "
        "(cross_moderate_network_slow_traffic_1b: reference crash "
        "0.0013).  (5) *combined_medium_1 residual crash ~0.004* — the "
        "r5 medium-seed-1 policy is genuinely zero-crash standalone "
        "(0/4096 at the recording eval, confirmed at 2048-episode "
        "selection evals) and merges at the reference's pace, but it "
        "drives close enough to the margin that the arbiter's gates "
        "fire at 8.6%% of ticks (reference 2.4%%), and the resulting "
        "policy<->ST handoffs create one-tick traps the certificate's "
        "single-step lookahead cannot pre-empt; the sibling seeds (and "
        "the reference's own policies) stay in the low-activity regime "
        "where the combined row is clean.  The same family's "
        "cross_medium_network_heavy_traffic_1b row (~0.004-0.006) was "
        "forensics-classified identically (8 dumps / 2000 episodes: "
        "every crash preceded by a certifiably-feasible state, with "
        "the solver condemning only once the trap has formed — 5-22 "
        "ticks before impact in heavy traffic's longer doomed "
        "corridors).", ""]

    # headline summary
    n_zero = sum(1 for _, o, r in matched
                 if r["crashed"] == 0.0 and o["crashed"] == 0.0)
    n_ref_zero = sum(1 for _, _, r in matched if r["crashed"] == 0.0)
    speedups = [r["clock_time_per_step"] / o["clock_time_per_step"]
                for _, o, r in matched
                if o["clock_time_per_step"] > 0
                and not pd.isna(r["clock_time_per_step"])]
    if speedups:
        speed_txt = (f"median wall-clock speedup "
                     f"**{np.median(speedups):,.0f}x** (range "
                     f"{min(speedups):,.0f}-{max(speedups):,.0f}x)")
    else:  # e.g. fresh clone with an empty run_data.csv (ADVICE r3)
        speed_txt = "no matched row carries a usable clock_time_per_step"
    lines += [
        f"**{len(matched)}** matched reference configs; "
        f"**{n_zero}/{n_ref_zero}** of the reference's zero-crash rows "
        f"reproduced at exactly 0.0 crash; " + speed_txt + ".", ""]

    for fam in ("st", "combined", "cross", "ddpg"):
        rows = [(n, o, r) for n, o, r in matched if family(n) == fam]
        if not rows:
            continue
        lines += [f"## {fam} family", "",
                  "| config | crash ours | crash ref (SEM) | merge ours "
                  "| merge ref | jerk ours | jerk ref | t-merge ours "
                  "| t-merge ref | s/step ours | s/step ref | speed "
                  "| Δ>10% |",
                  "|---|---|---|---|---|---|---|---|---|---|---|---|---|"]
        for name, o, r in sorted(rows):
            sem = r.get("crashed_std", np.nan)
            ratio = (r["clock_time_per_step"] / o["clock_time_per_step"]
                     if o["clock_time_per_step"] > 0 else np.nan)
            # flag headline metrics more than 10% off the reference
            # (crash: flag only when we are >10% *worse*, i.e. higher,
            # and by more than 2 SEM so 0.000x noise doesn't flag)
            flags = []
            sem_val = 0.0 if pd.isna(sem) else sem
            if not pd.isna(r["crashed"]) and o["crashed"] > max(
                    r["crashed"] * 1.1, r["crashed"] + 2 * sem_val):
                flags.append("c↑")
            for key, tag in (("mean_abs_jerk", "j"),
                             ("time_to_merge", "t")):
                rv, ov = r.get(key, np.nan), o.get(key, np.nan)
                if not pd.isna(rv) and not pd.isna(ov) and rv > 0:
                    dev = (ov - rv) / rv
                    if abs(dev) > 0.10:
                        flags.append(f"{tag}{'+' if dev > 0 else ''}"
                                     f"{dev:.0%}")
            lines.append(
                f"| {name} | {fmt(o['crashed'])} | {fmt(r['crashed'])} "
                f"({fmt(sem)}) | {fmt(o['merged'])} | {fmt(r['merged'])} "
                f"| {fmt(o['mean_abs_jerk'], 3)} "
                f"| {fmt(r['mean_abs_jerk'], 3)} "
                f"| {fmt(o.get('time_to_merge', np.nan), 2)} "
                f"| {fmt(r.get('time_to_merge', np.nan), 2)} "
                f"| {o['clock_time_per_step']:.2e} "
                f"| {fmt(r['clock_time_per_step'])} "
                f"| {'—' if pd.isna(ratio) else format(ratio, ',.0f') + 'x'} "
                f"| {' '.join(flags) if flags else '—'} |")
        lines.append("")

    extra = sorted(n for n in ours["LOG_DIR"]
                   if best_reference_row(ref, n) is None)
    if extra:
        lines += ["## Our rows with no reference counterpart", ""]
        lines += [f"- {n}" for n in extra] + [""]
    if missing:
        lines += ["## Reference rows not yet reproduced", ""]
        lines += [f"- {n}" for n in missing] + [""]

    with open(out_path, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print("\n".join(lines[:12]))
    print(f"... wrote {out_path}: {len(matched)} matched, "
          f"{len(missing)} reference rows missing")


if __name__ == "__main__":
    main(*sys.argv[1:])
