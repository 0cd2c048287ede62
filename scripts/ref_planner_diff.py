"""Differential-test our grid builder + DP against the reference's own code.

VERDICT r5 item 2 (sparse/fast ST jerk +8-38%): the probe showed the
excess jerk is trajectory *shape* (higher sprint peak, later brake), not
replan chatter — so either the obstacle grid we hand-derived
(planner/grid.py vs reference st.py:25-71) or the closed-loop inputs
differ.  This script runs the REFERENCE'S OWN grid builder
(``st.find_s_t_obstacles_from_state``) and pure-python DP
(``st.solve_st_fast_v2``) — imported from /root/reference with
traci/cvxopt/st_cy stubbed — on sensed states captured from OUR st_fast
episodes, and diffs them element-by-element against planner/grid.py +
ops/st_dp.py on the same states.

Usage: python scripts/ref_planner_diff.py --config st_fast --episodes 16
"""

from __future__ import annotations

import argparse
import os
import sys
import types

sys.path.insert(0, ".")


def install_reference_stubs():
    """Make /root/reference importable without SUMO/cvxopt/Cython."""
    os.environ.setdefault("SUMO_HOME", "/tmp")
    traci = types.ModuleType("traci")
    traci.simulation = types.SimpleNamespace(getDeltaT=lambda: 0.2)
    traci.vehicle = types.SimpleNamespace()
    sys.modules.setdefault("traci", traci)
    cvxopt = types.ModuleType("cvxopt")
    cvxopt.solvers = types.SimpleNamespace(options={},
                                           qp=lambda *a, **k: None)
    cvxopt.matrix = lambda *a, **k: None
    sys.modules.setdefault("cvxopt", cvxopt)
    sys.modules.setdefault("st_cy", types.ModuleType("st_cy"))
    sys.path.insert(0, "/root/reference")


def sync_reference_settings(cfg):
    """Copy the loaded config's planner-relevant scalars onto the
    reference Settings class so its functions see identical knobs."""
    from config import Settings as RefSettings     # /root/reference
    for name in ("FUTURE_S", "S_DISCRETIZATION", "T_DISCRETIZATION",
                 "FUTURE_T", "START_UNCERTAINTY", "UNCERTAINTY_PER_SECOND",
                 "CAR_LENGTH", "CRASH_MIN_S", "MIN_ALLOWED_DISTANCE",
                 "MAX_SPEED", "MAX_POSITIVE_ACCELERATION",
                 "MAX_NEGATIVE_ACCELERATION", "MAXIMUM_POSITIVE_JERK",
                 "MINIMUM_NEGATIVE_JERK", "D_WEIGHT", "V_WEIGHT",
                 "A_WEIGHT", "J_WEIGHT", "DESIRED_SPEED", "TICK_LENGTH",
                 "MAX_PREDICTED_DECELERATION", "DESIRED_TTC",
                 "MIN_FOLLOW_DISTANCE"):
        if hasattr(cfg, name):
            setattr(RefSettings, name, getattr(cfg, name))
    RefSettings.USE_CYTHON = False
    return RefSettings


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="st_fast")
    ap.add_argument("--episodes", type=int, default=16)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--stride", type=int, default=5,
                    help="compare every Nth tick")
    ap.add_argument("--save-states", default=None,
                    help="capture closed-loop states to this .npz and "
                         "exit (run on the TPU, production f32 path)")
    ap.add_argument("--states", default=None,
                    help="skip capture; load states from this .npz and "
                         "compare in genuine float64 (enables x64 — run "
                         "with --platform cpu so the production Pallas "
                         "path is not involved)")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax
    if args.states:
        # true float64 comparison: x64 must be on BEFORE any jax use
        jax.config.update("jax_enable_x64", True)
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
    from rl_mpc_lanemerging_tpu.ops import st_dp
    from rl_mpc_lanemerging_tpu.planner import mpc
    from rl_mpc_lanemerging_tpu.planner.grid import build_st_grid
    from rl_mpc_lanemerging_tpu.prediction import HighwayState
    from rl_mpc_lanemerging_tpu.sim.episode import run_episode_batch

    cfg = Settings.load_from_file(f"configs/{args.config}.json").replace(
        BATCH_SCENARIOS=args.batch)

    if args.states:
        # ---- load previously captured states ---------------------------
        data = np.load(args.states)
        hist = HighwayState(**{k: data[k] for k in HighwayState._fields})
        ticks = data["ticks"]
    else:
        # ---- capture sensed states from production closed-loop episodes
        world = tasks.make_worlds(cfg, batch=args.batch,
                                  dtype=jnp.float32)
        from rl_mpc_lanemerging_tpu.ops.st_pallas import LANE_TILE
        force_reference = (args.batch % LANE_TILE != 0) \
            or jax.default_backend() == "cpu"
        controller = mpc.make_batched_controller(
            cfg, force_reference=force_reference)
        run = jax.jit(lambda w: run_episode_batch(
            w, cfg, controller, max_episode_length=cfg.MAX_EPISODE_LENGTH,
            record_history=True))
        _, stats, hist = jax.block_until_ready(run(world))
        hist = jax.tree.map(lambda x: np.asarray(x), hist)
        ticks = np.asarray(stats.ticks)
        if args.save_states:
            np.savez(args.save_states, ticks=ticks,
                     **{k: getattr(hist, k) for k in HighwayState._fields})
            print(f"saved states -> {args.save_states}")
            return

    # ---- reference imports -------------------------------------------------
    install_reference_stubs()
    RefSettings = sync_reference_settings(cfg)
    import prediction as ref_prediction
    import st as ref_st

    our_grid = jax.jit(lambda s: build_st_grid(s, cfg, dtype=jnp.float64))
    w = mpc.weights_from_settings(cfg)
    max_off = st_dp.default_max_offset(
        cfg.MAX_SPEED, cfg.T_DISCRETIZATION, cfg.S_DISCRETIZATION)
    our_solve = jax.jit(lambda g, a: st_dp.solve_st_fast(
        g.obstacles, g.s_values, g.t_values, g.ego_speed, a,
        g.distances, w, max_off))

    n_states = 0
    grid_mismatch = {"obstacles": 0, "distances": 0, "s_values": 0}
    worst = {"obstacles": 0.0, "distances": 0.0, "s_values": 0.0}
    path_mismatch = 0
    path_worst = 0.0
    cross_mismatch = 0        # ref solver on ref grid vs our solver on our grid
    first_reports = 0

    for ep in range(min(args.episodes, args.batch)):
        for t in range(0, int(ticks[ep]), args.stride):
            st8 = jax.tree.map(lambda x: x[ep, t], hist)
            if st8.ego_x <= -199.0:       # ego absent sentinel
                continue
            n_states += 1
            present = np.asarray(st8.other_present)
            xs = [float(x) for x, p in zip(np.asarray(st8.other_x), present)
                  if p]
            vs = [float(v) for v, p in zip(np.asarray(st8.other_speed),
                                           present) if p]
            accs = [float(a) for a, p in zip(np.asarray(st8.other_accel),
                                             present) if p]
            ref_state = ref_prediction.HighwayState(
                (float(st8.ego_x), float(st8.ego_y)), float(st8.ego_speed),
                float(st8.ego_accel), xs, vs, accs)
            r_obs, r_sv, r_tv, r_v0, r_dist = \
                ref_st.find_s_t_obstacles_from_state(
                    ref_state, cfg.FUTURE_S, cfg.S_DISCRETIZATION,
                    cfg.T_DISCRETIZATION, cfg.FUTURE_T,
                    cfg.START_UNCERTAINTY, cfg.UNCERTAINTY_PER_SECOND)

            ours_in = jax.tree.map(
                lambda x: jnp.asarray(x, jnp.float64)
                if np.asarray(x).dtype.kind == "f" else jnp.asarray(x), st8)
            g = our_grid(ours_in)
            o_obs = np.asarray(g.obstacles)
            o_sv = np.asarray(g.s_values)
            o_dist = np.asarray(g.distances)

            tshape = min(r_obs.shape[0], o_obs.shape[0])
            sshape = min(r_obs.shape[1], o_obs.shape[1])
            if r_obs.shape != o_obs.shape:
                print(f"ep{ep} t{t}: SHAPE ref{r_obs.shape} ours"
                      f"{o_obs.shape}")
            d_sv = np.abs(r_sv[:sshape] - o_sv[:sshape]).max()
            d_ob = (r_obs[:tshape, :sshape]
                    != o_obs[:tshape, :sshape]).sum()
            dd = np.abs(np.minimum(r_dist[:tshape, :sshape], 1e6)
                        - np.minimum(o_dist[:tshape, :sshape], 1e6)).max()
            worst["s_values"] = max(worst["s_values"], float(d_sv))
            worst["obstacles"] = max(worst["obstacles"], float(d_ob))
            worst["distances"] = max(worst["distances"], float(dd))
            bad = False
            if d_sv > 1e-6:
                grid_mismatch["s_values"] += 1
                bad = True
            if d_ob > 0:
                grid_mismatch["obstacles"] += 1
                bad = True
            if dd > 1e-6:
                grid_mismatch["distances"] += 1
                bad = True
            if bad and first_reports < 5:
                first_reports += 1
                cells = np.argwhere(r_obs[:tshape, :sshape]
                                    != o_obs[:tshape, :sshape])[:5]
                dcells = np.argwhere(
                    np.abs(np.minimum(r_dist[:tshape, :sshape], 1e6)
                           - np.minimum(o_dist[:tshape, :sshape], 1e6))
                    > 1e-6)[:5]
                print(f"ep{ep} t{t}: d_sv={d_sv:.2e} obs_cells={d_ob} "
                      f"d_dist={dd:.3f} at obs{cells.tolist()} "
                      f"dist{dcells.tolist()} ego_s≈{r_sv[0]:.2f} "
                      f"v={r_v0:.2f} ncars={len(xs)}")

            # ---- coarse DP paths -----------------------------------------
            r_seq = ref_st.solve_st_fast_v2(
                r_obs, r_sv, r_tv, float(r_v0), float(st8.ego_accel),
                r_dist)
            o_seq = np.asarray(our_solve(g, jnp.asarray(float(st8.ego_accel),
                                                        jnp.float64)))
            m = min(len(r_seq), len(o_seq))
            dpath = np.abs(np.asarray(r_seq[:m]) - o_seq[:m]).max()
            path_worst = max(path_worst, float(dpath))
            if dpath > cfg.S_DISCRETIZATION / 2:
                path_mismatch += 1
                if first_reports < 10:
                    first_reports += 1
                    k = int(np.abs(np.asarray(r_seq[:m])
                                   - o_seq[:m]).argmax())
                    print(f"ep{ep} t{t}: PATH diff {dpath:.3f} at step {k} "
                          f"ref={r_seq[k]:.2f} ours={o_seq[k]:.2f} "
                          f"v0={r_v0:.2f} a0={float(st8.ego_accel):.2f}")

    print(f"\ncompared {n_states} states "
          f"({args.episodes} episodes, stride {args.stride})")
    print(f"grid mismatches: {grid_mismatch}  worst: "
          + ", ".join(f"{k}={v:.4g}" for k, v in worst.items()))
    print(f"coarse-path mismatches (> delta_s/2): {path_mismatch}  "
          f"worst |ds|={path_worst:.4f}")


if __name__ == "__main__":
    main()
