"""Closed-loop test: does the reference's maxiters=10 QP under-convergence
explain the sparse/fast-traffic ST jerk gap?

Chain of evidence so far (VERDICT r5 item 2):
  * the per-tick jerk excess is trajectory *shape* (higher sprint peak,
    harder brake), uniform across episodes — not replan chatter and not a
    stop-and-go tail (st_profile_probe.py);
  * our grid builder + coarse DP match the reference's own code
    element-for-element on captured closed-loop states
    (ref_planner_diff.py: worst path diff 0.0000);
  * our ADMM smoother is converged (first-step |dv| ~ 1e-4 vs a
    5000-iteration solve) — so the remaining pipeline difference is the
    reference's smoother itself: st.py:16-17 caps cvxopt's interior-point
    at ``maxiters = 10``, and a mid-path IP iterate is *centered away
    from the active accel/jerk constraints*, i.e. systematically softer
    than the true QP optimum exactly during bang-bang maneuvers.

This script runs the production closed loop (TPU sim + Pallas DP) with
the smoother swapped for a host-side Mehrotra predictor-corrector QP
capped at N iterations (cvxopt coneqp's algorithm family), and reports
crash/merge/jerk/t-merge per mode:

  admm     production ADMM (sanity: reproduces the recorded row)
  ip50     IP run to convergence (sanity: must match admm)
  ip10     IP capped at 10 iterations (the reference's setting)

Usage: python scripts/st_qp_softening_probe.py --config st_fast
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")


# --------------------------------------------------------------------------
# Host-side QP: min ||x - b||^2  s.t.  G x <= h,  x[0] = s0
# Mehrotra predictor-corrector primal-dual interior point, dense KKT.
# --------------------------------------------------------------------------

def ip_qp(b, G, h, s0, maxiters=10, tol=1e-8):
    n = b.size
    m = G.shape[0]
    A = np.zeros((1, n))
    A[0, 0] = 1.0
    ba = np.array([s0])
    q = -2.0 * b

    x = b.copy()
    x[0] = s0
    s = np.maximum(h - G @ x, 1.0)
    z = np.ones(m)
    y = np.zeros(1)

    for _ in range(maxiters):
        rx = 2.0 * x + q + G.T @ z + A.T @ y
        rz = G @ x + s - h
        ry = A @ x - ba
        mu = float(s @ z) / m
        if (np.linalg.norm(rx) < tol and np.linalg.norm(rz) < tol
                and np.linalg.norm(ry) < tol and mu < tol):
            break

        d = z / s                                    # (m,)
        H = 2.0 * np.eye(n) + G.T @ (d[:, None] * G)
        # KKT with the single equality row via block elimination:
        #   H dx + A' dy = rhs,  A dx = -ry
        Hinv_At = np.linalg.solve(H, A.T)            # (n, 1)
        schur = A @ Hinv_At                          # (1, 1)

        def newton(rs_z):
            # rs_z: the complementarity rhs (length m)
            rhs = -(rx + G.T @ ((rs_z + z * rz) / s))
            w = np.linalg.solve(H, rhs)
            dy = np.linalg.solve(schur, (A @ w) + ry)[..., 0]
            dx = w - Hinv_At[:, 0] * dy
            ds = -(rz + G @ dx)
            dz = (rs_z - z * ds) / s
            return dx, dy, ds, dz

        # predictor (affine)
        dx_a, dy_a, ds_a, dz_a = newton(-s * z)
        ap = _step_len(s, ds_a)
        ad = _step_len(z, dz_a)
        mu_aff = float((s + ap * ds_a) @ (z + ad * dz_a)) / m
        sigma = (mu_aff / max(mu, 1e-300)) ** 3
        # corrector
        dx, dy, ds, dz = newton(-s * z - ds_a * dz_a + sigma * mu)
        ap = min(1.0, 0.99 * _step_len(s, ds))
        ad = min(1.0, 0.99 * _step_len(z, dz))
        x += ap * dx
        s += ap * ds
        z += ad * dz
        y += ad * dy
    return x


def _step_len(v, dv):
    neg = dv < 0
    if not np.any(neg):
        return 1.0
    return float(min(1.0, np.min(-v[neg] / dv[neg])))


def build_ineq(n, dt, max_speed, pos_a, neg_a, pos_j, neg_j, v0, a0):
    """Reference finer_fit constraint stack (st.py:608-668): velocity,
    acceleration and jerk rows, both signs, with the measured-start
    boundary forms."""
    dt2, dt3 = dt * dt, dt ** 3
    rows, rhs = [], []

    def add(r, val):
        rows.append(r)
        rhs.append(val)

    for i in range(n - 1):                       # v >= 0  -> -v <= 0
        r = np.zeros(n)
        r[i], r[i + 1] = 1.0 / dt, -1.0 / dt
        add(r, 0.0)
    for i in range(n - 1):                       # v <= vmax
        r = np.zeros(n)
        r[i], r[i + 1] = -1.0 / dt, 1.0 / dt
        add(r, max_speed)
    for i in range(n - 1):                       # a <= amax
        r = np.zeros(n)
        if i == 0:
            r[0], r[1] = -1.0 / dt2, 1.0 / dt2
            add(r, pos_a + v0 / dt)
        else:
            r[i - 1], r[i], r[i + 1] = 1.0 / dt2, -2.0 / dt2, 1.0 / dt2
            add(r, pos_a)
    for i in range(n - 1):                       # a >= amin
        r = np.zeros(n)
        if i == 0:
            r[0], r[1] = 1.0 / dt2, -1.0 / dt2
            add(r, -neg_a - v0 / dt)
        else:
            r[i - 1], r[i], r[i + 1] = -1.0 / dt2, 2.0 / dt2, -1.0 / dt2
            add(r, -neg_a)
    for i in range(n - 1):                       # j <= jmax
        r = np.zeros(n)
        if i == 0:
            r[0], r[1] = -1.0 / dt3, 1.0 / dt3
            add(r, pos_j + a0 / dt + v0 / dt2)
        elif i == 1:
            r[0], r[1], r[2] = 2.0 / dt3, -3.0 / dt3, 1.0 / dt3
            add(r, pos_j - v0 / dt2)
        else:
            r[i - 2], r[i - 1], r[i], r[i + 1] = \
                -1.0 / dt3, 3.0 / dt3, -3.0 / dt3, 1.0 / dt3
            add(r, pos_j)
    for i in range(n - 1):                       # j >= jmin
        r = np.zeros(n)
        if i == 0:
            r[0], r[1] = 1.0 / dt3, -1.0 / dt3
            add(r, -neg_j - a0 / dt - v0 / dt2)
        elif i == 1:
            r[0], r[1], r[2] = -2.0 / dt3, 3.0 / dt3, -1.0 / dt3
            add(r, -neg_j + v0 / dt2)
        else:
            r[i - 2], r[i - 1], r[i], r[i + 1] = \
                1.0 / dt3, -3.0 / dt3, 3.0 / dt3, -1.0 / dt3
            add(r, -neg_j)
    return np.stack(rows), np.array(rhs)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="st_fast")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--modes", default="admm,ip50,ip10")
    ap.add_argument("--out", default=None,
                    help="append a markdown row per mode to this file")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from rl_mpc_lanemerging_tpu import tasks
    from rl_mpc_lanemerging_tpu.config import Settings
    from rl_mpc_lanemerging_tpu.ops import qp
    from rl_mpc_lanemerging_tpu.planner import mpc
    from rl_mpc_lanemerging_tpu.sim import world as world_mod
    from rl_mpc_lanemerging_tpu.sim.episode import (
        _sample_start_speed, sense_batch, warmup)

    cfg = Settings.load_from_file(f"configs/{args.config}.json").replace(
        BATCH_SCENARIOS=args.batch)
    dt = cfg.TICK_LENGTH
    n_fine = cfg.fine_horizon
    max_ticks = int(cfg.MAX_EPISODE_LENGTH / dt)

    plan_fn = jax.jit(lambda s: mpc.batched_plan(
        s, cfg, jnp.float32, use_pallas=True)[:2])
    op = qp.build_operator(n_fine, dt)
    admm_fn = jax.jit(lambda seq, valid, v0, a0: jax.vmap(
        lambda sq, vl, v, a: qp.finer_fit_qp(
            sq, vl, v, a, op, cfg.T_DISCRETIZATION, cfg.MAX_SPEED,
            cfg.MAX_POSITIVE_ACCELERATION, cfg.MAX_NEGATIVE_ACCELERATION,
            cfg.MAXIMUM_POSITIVE_JERK, cfg.MINIMUM_NEGATIVE_JERK,
            iterations=cfg.QP_ITERATIONS))(seq, valid, v0, a0))
    step_fn = jax.jit(jax.vmap(
        lambda w, c: world_mod.world_step(w, c, cfg)))

    def interp(seq, valid):
        t = np.arange(valid) * cfg.T_DISCRETIZATION
        sub = int(np.round(t[-1] / dt + 1)) if valid > 1 else 1
        if sub > 1 and (sub - 1) * dt > t[-1]:
            sub -= 1
        ft = np.arange(sub) * dt
        return np.interp(ft, t, seq[:valid]), sub

    def run_mode(mode):
        world = tasks.make_worlds(cfg, batch=args.batch, dtype=jnp.float32)
        world = warmup(world, cfg, int(50.0 / dt))
        keys = jax.vmap(jax.random.split)(world.rng)
        world = world._replace(rng=keys[:, 0])
        sv = jax.vmap(lambda k: _sample_start_speed(
            k, cfg, jnp.float32))(keys[:, 1])
        world = jax.vmap(world_mod.add_ego)(world, sv)
        world = step_fn(world, sv)

        B = args.batch
        done = np.zeros(B, bool)
        crashed = np.zeros(B, bool)
        merged = np.zeros(B, bool)
        ticks = np.zeros(B, np.int32)
        sum_j = np.zeros(B)
        prev_a = np.zeros(B, np.float32)

        for tick in range(max_ticks):
            w_arr = world
            arrived = np.asarray(w_arr.ego_arrived) & ~done
            collided = np.asarray(w_arr.ego_collided) & ~done
            merged |= arrived
            crashed |= collided
            done |= arrived | collided
            if done.all():
                break
            active = ~done
            states = sense_batch(world, cfg)
            a_now = np.asarray(states.ego_accel, np.float32)
            jerk = (a_now - prev_a) / dt
            sum_j += np.where(active, np.abs(jerk), 0.0)
            ticks += active.astype(np.int32)
            prev_a = np.where(active, a_now, prev_a)

            seq, valid = plan_fn(states)
            v0 = np.asarray(states.ego_speed, np.float32)
            a0 = np.asarray(states.ego_accel, np.float32)
            if mode == "admm":
                fine = np.asarray(admm_fn(seq, valid, jnp.asarray(v0),
                                          jnp.asarray(a0))[0])
                speeds = (fine[:, 1] - fine[:, 0]) / dt
                fl = None
            else:
                iters = int(mode[2:])
                seq_np = np.asarray(seq)
                valid_np = np.asarray(valid)
                speeds = np.zeros(B, np.float32)
                for i in range(B):
                    if not active[i]:
                        continue
                    bvec, sub = interp(seq_np[i], int(valid_np[i]))
                    if sub <= 1:
                        speeds[i] = v0[i]
                        continue
                    G, h = build_ineq(
                        sub, dt, cfg.MAX_SPEED,
                        cfg.MAX_POSITIVE_ACCELERATION,
                        cfg.MAX_NEGATIVE_ACCELERATION,
                        cfg.MAXIMUM_POSITIVE_JERK,
                        cfg.MINIMUM_NEGATIVE_JERK, v0[i], a0[i])
                    x = ip_qp(bvec, G, h, bvec[0], maxiters=iters)
                    speeds[i] = (x[1] - x[0]) / dt
            v_prev = np.asarray(world.ego_v)
            speeds = np.where(active, speeds, v_prev)
            world = step_fn(world, jnp.asarray(speeds, jnp.float32))
            # freeze finished scenarios
            world = jax.tree.map(
                lambda new, old: jnp.where(
                    jnp.asarray(active).reshape(
                        (-1,) + (1,) * (new.ndim - 1)), new, old),
                world, w_arr)

        per_j = sum_j / np.maximum(ticks, 1)
        res = dict(mode=mode, crash=float(crashed.mean()),
                   merge=float(merged.mean()),
                   jerk=float(per_j[merged].mean()),
                   t_merge=float((ticks[merged] * dt).mean()))
        print(f"{mode:6s} crash={res['crash']:.4f} merge={res['merge']:.4f}"
              f" jerk={res['jerk']:.3f} t_merge={res['t_merge']:.2f}",
              flush=True)
        return res

    results = [run_mode(m) for m in args.modes.split(",")]
    if args.out:
        with open(args.out, "a") as fh:
            for r in results:
                fh.write(f"| {args.config} | {r['mode']} | {r['crash']:.4f} "
                         f"| {r['merge']:.4f} | {r['jerk']:.3f} "
                         f"| {r['t_merge']:.2f} |\n")


if __name__ == "__main__":
    main()
