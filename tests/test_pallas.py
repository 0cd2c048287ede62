"""Pallas wavefront kernel vs the portable jnp DP (interpret mode on CPU).

The kernel's f32/relative-offset semantics may pick a different equal-cost
tail on a handful of lattices; the *executed first step* must agree, and
the vast majority of full paths must match exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np

from rl_mpc_lanemerging_tpu.config import Settings
from rl_mpc_lanemerging_tpu.ops import st_dp, st_pallas

CFG = Settings()
T, S, B = 8, 301, 128


def weights():
    return st_dp.STWeights(
        CFG.D_WEIGHT, CFG.V_WEIGHT, CFG.A_WEIGHT, CFG.J_WEIGHT,
        CFG.DESIRED_SPEED, CFG.MAX_SPEED, CFG.MAX_NEGATIVE_ACCELERATION,
        CFG.MAX_POSITIVE_ACCELERATION, CFG.MINIMUM_NEGATIVE_JERK,
        CFG.MAXIMUM_POSITIVE_JERK, CFG.MIN_ALLOWED_DISTANCE)


def random_batch(seed=0):
    rng = np.random.default_rng(seed)
    obst = np.zeros((B, T, S), bool)
    dist = np.full((B, T, S), 1e10, np.float32)
    for b in range(B):
        for _ in range(rng.integers(0, 3)):
            pos = rng.uniform(0, S)
            vel = rng.uniform(-30, 30)
            half = int(rng.integers(20, 60))
            for t in range(T):
                c = int(pos + vel * t)
                lo, hi = max(c - half, 0), min(c + half, S)
                if lo < S and hi > 0:
                    obst[b, t, lo:hi] = True
                d2 = np.minimum(np.abs(np.arange(S) - (c - half)),
                                np.abs(np.arange(S) - (c + half))) * 0.05
                dist[b, t] = np.minimum(dist[b, t], d2)
        dist[b][obst[b]] = 0
    obst[:, :, 0] = False
    s_values = (rng.uniform(-150, 0, (B, 1))
                + np.arange(S)[None, :] * 0.05).astype(np.float32)
    v0 = rng.uniform(0, 25, B).astype(np.float32)
    a0 = rng.uniform(-5, 4, B).astype(np.float32)
    return obst, s_values, v0, a0, dist


def test_pallas_kernel_matches_dense_dp():
    w = weights()
    moff = st_dp.default_max_offset(CFG.MAX_SPEED, 0.3, 0.05)
    obst, s_values, v0, a0, dist = random_batch()

    solver = st_pallas.make_pallas_solver(0.3, 0.05, w, moff, T, S,
                                          interpret=True)
    seq_p = np.asarray(solver(jnp.asarray(obst), jnp.asarray(s_values),
                              jnp.asarray(v0), jnp.asarray(a0),
                              jnp.asarray(dist)))

    t_values = jnp.asarray((np.arange(T) * 0.3).astype(np.float32))
    dp = jax.jit(jax.vmap(
        lambda ob, sv, es, ac, di: st_dp.solve_st_fast(
            ob, sv, t_values, es, ac, di, w, moff)))
    seq_j = np.asarray(dp(jnp.asarray(obst), jnp.asarray(s_values),
                          jnp.asarray(v0), jnp.asarray(a0),
                          jnp.asarray(dist)))

    # executed control: first steps agree except rare f32 near-ties, which
    # may flip by at most ~2 lattice cells (0.1 m over one 0.3 s step)
    step_diff = np.abs((seq_p[:, 1] - seq_p[:, 0])
                       - (seq_j[:, 1] - seq_j[:, 0]))
    assert np.mean(step_diff < 1e-4) > 0.97, \
        f"{np.mean(step_diff >= 1e-4):.2%} first steps differ"
    assert step_diff.max() < 0.15, f"max first-step diff {step_diff.max()}"
    # full paths: near-total agreement (equal-cost tails may differ on a
    # few lattices due to relative-offset rounding)
    match = np.all(np.isclose(seq_p, seq_j, atol=1e-3), axis=1).mean()
    assert match > 0.9, f"only {match:.2%} of paths matched"
