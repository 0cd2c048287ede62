"""Combined RL+MPC arbiter — the paper's core contribution.

TPU-native re-design of ``RLAgent.do_combined_control``
(reference: dqn.py:117-200).  Per tick and per scenario:

1. roll the RL policy forward ROLLOUT_LENGTH virtual steps through the
   forecaster (re-querying the policy each step, dqn.py:129-141), stopping
   early on a predicted crash or past STOP_X;
2. the MPC takes over when any enabled gate fires:
   a. the rollout predicts a crash (CHECK_ROLLOUT_CRASH, dqn.py:144-147),
   b. the RL exceeds the desired speed (LIMIT_DQN_SPEED, dqn.py:148-151),
   c. the safety certificate condemns the step-ST_TEST_ROLLOUTS rollout
      state (TEST_ROLLOUT_STATE, dqn.py:152-155),
   d. the ST path is strictly better — lower mean |jerk| AND more
      progress over the common horizon, or the RL made no progress
      (TEST_ST_STRICTLY_BETTER, dqn.py:156-197);
3. otherwise the RL's first action executes through set_ego_jerk.

Where the reference re-runs the native solver up to three times per tick
(certificate + strictly-better + takeover), the batched version shares one
solve from the current state between the strictly-better comparison and the
executed takeover command, plus one solve from the rollout test state — all
four gates evaluate branchlessly across the batch and the final command is
a ``jnp.where`` select.

Both solves route through ``mpc.batched_st_control`` /
``mpc.batched_test_guaranteed_crash``, which use the Pallas wavefront
kernel on accelerators (the same production path as the ST-only
evaluation) and the portable dense DP on CPU.  The dense DP materializes
(max_offset x S) candidate tensors per layer per scenario — multi-GB of
live intermediates at production batch sizes, which faulted the TPU in
round 2's combined runs — so it is never selected on device backends.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np

from .. import geometry
from ..config import Settings
from ..ops import qp
from ..planner import mpc
from ..prediction import HighwayState, predict_step_with_ego

__all__ = ["combined_controller", "path_mean_abs_jerk"]


def _speed_from_jerk(v, a, jerk, cfg: Settings):
    """control.py:160-171 integrator."""
    new_a = jnp.clip(a + jerk * cfg.TICK_LENGTH,
                     cfg.MAX_NEGATIVE_ACCELERATION,
                     cfg.MAX_POSITIVE_ACCELERATION)
    return jnp.clip(v + new_a * cfg.TICK_LENGTH, 0.0, cfg.MAX_SPEED)


def path_mean_abs_jerk(seq, length, v0, a0, delta_t):
    """Masked mean |jerk| along a path prefix (reference st.py:274-288):
    jerks from consecutive differences seeded with the measured v0/a0."""
    n = seq.shape[0]
    v = jnp.diff(seq) / delta_t                      # (n-1,)
    a = (v - jnp.concatenate([v0[None], v[:-1]])) / delta_t
    j = (a - jnp.concatenate([a0[None], a[:-1]])) / delta_t
    steps = jnp.arange(1, n)
    mask = steps <= (length - 1)
    total = jnp.sum(jnp.where(mask, jnp.abs(j), 0.0))
    return total / jnp.maximum(length - 1, 1)


def _rl_rollout(policy, states: HighwayState, first_jerk, cfg: Settings):
    """Virtual rollout (dqn.py:129-141), batched with per-scenario
    freezing.  Returns (s_history (B, R+1), rollout_len (B,), crash (B,),
    last_selected_speed (B,), test_state)."""
    rollouts = max(cfg.ROLLOUT_LENGTH, 1)
    b = states.ego_speed.shape[0]
    s0 = geometry.get_ego_s(states.ego_x, states.ego_y)

    st = states
    stopped = jnp.zeros((b,), bool)
    crash = jnp.zeros((b,), bool)
    sel_speed = jnp.zeros_like(states.ego_speed)
    test_st = states
    jerk = first_jerk
    emitted = [s0]
    valid = [jnp.ones((b,), bool)]

    for i in range(1, rollouts + 1):
        if i != 1:
            jerk = policy(st)                      # re-query (dqn.py:131-132)
        sel = _speed_from_jerk(st.ego_speed, st.ego_accel, jerk, cfg)
        nxt, crashed_now = jax.vmap(
            lambda s, sp: predict_step_with_ego(
                s, sp, cfg.TICK_LENGTH, cfg,
                cfg.COMBINATION_MIN_DISTANCE))(st, sel)
        # freeze scenarios that already stopped
        keep = lambda new, old: jax.tree.map(
            lambda x, y: jnp.where(
                stopped.reshape(stopped.shape + (1,) * (x.ndim - 1)),
                y, x), new, old)
        nxt = keep(nxt, st)
        sel_speed = jnp.where(stopped, sel_speed, sel)
        crash = crash | (~stopped & crashed_now)
        emitted.append(geometry.get_ego_s(nxt.ego_x, nxt.ego_y))
        valid.append(~stopped)
        if i == cfg.ST_TEST_ROLLOUTS:
            # frozen scenarios carry their final state through, matching
            # the reference's "last state" fallback (dqn.py:142-143)
            test_st = nxt
        stopped = stopped | crash | (nxt.ego_x > cfg.STOP_X)
        st = nxt

    if cfg.ST_TEST_ROLLOUTS > rollouts or cfg.ST_TEST_ROLLOUTS < 1:
        test_st = st

    s_hist = jnp.stack(emitted, axis=1)            # (B, R+1)
    valid_m = jnp.stack(valid, axis=1)
    rollout_len = jnp.sum(valid_m, axis=1)         # recorded points
    s_hist = jnp.where(valid_m, s_hist, 0.0)
    return s_hist, rollout_len, crash, sel_speed, test_st


def combined_controller(policy: Callable[[HighwayState], jax.Array],
                        cfg: Settings, dtype=jnp.float32,
                        use_pallas: bool | None = None):
    """Build (controller, init_carry, batch_stats_fn).

    ``controller``: batched HighwayState -> (speed commands, takeover flag)
    — the flag feeds the percent-ST statistic (reference dqn.py:101-115).
    With REMEMBER_LAST_CHOICE_FOR_SWITCHING_COMBINED the controller is
    stateful (carry = last tick's takeover flags, the vectorized
    ``takeover_history[-1]`` of reference dqn.py:126-127) and called as
    ``controller(states, carry)``; ``init_carry(batch)`` builds the initial
    carry, or is None for the stateless form.
    ``batch_stats_fn``: EpisodeStats -> custom stat dict for aggregation.

    ``use_pallas`` selects the ST solver backend for the 2 solves per tick;
    None picks the Pallas kernel on accelerators and the portable dense DP
    on CPU (same policy as ``mpc.make_batched_controller``).
    """
    remember = cfg.REMEMBER_LAST_CHOICE_FOR_SWITCHING_COMBINED
    if use_pallas is None:
        use_pallas = jax.default_backend() != "cpu"

    def _control(states: HighwayState, last_take):
        first_jerk = policy(states)
        v = states.ego_speed.astype(dtype)
        a = states.ego_accel.astype(dtype)

        s_hist, rollout_len, crash_pred, sel_speed, test_state = \
            _rl_rollout(policy, states, first_jerk, cfg)

        # --- ST solve shared by gate d and the takeover command ---
        st_speed, _seq, _valid, fine, fine_len, _grids = \
            mpc.batched_st_control(states, cfg, dtype, use_pallas)

        # --- gates ---
        take = jnp.zeros_like(crash_pred)
        if cfg.CHECK_ROLLOUT_CRASH:
            take = take | crash_pred
        if cfg.LIMIT_DQN_SPEED:
            take = take | (sel_speed > cfg.DESIRED_SPEED)
        if cfg.TEST_ROLLOUT_STATE:
            condemned = mpc.batched_test_guaranteed_crash(
                test_state, cfg, dtype, use_pallas)
            take = take | condemned

        rl_speed = _speed_from_jerk(v, a, first_jerk.astype(dtype), cfg)

        if cfg.TEST_ST_STRICTLY_BETTER:
            min_len = jnp.minimum(fine_len, rollout_len)
            st_jerk = jax.vmap(
                lambda f, L, vv, aa: path_mean_abs_jerk(
                    f, L, vv, aa, cfg.TICK_LENGTH))(fine, min_len, v, a)
            rl_jerk = jax.vmap(
                lambda h, L, vv, aa: path_mean_abs_jerk(
                    h, L, vv, aa, cfg.TICK_LENGTH))(s_hist, min_len, v, a)
            idxs = jnp.maximum(min_len - 1, 0)
            st_dist = jnp.take_along_axis(
                fine, idxs[:, None], axis=1)[:, 0] - fine[:, 0]
            rl_dist = jnp.take_along_axis(
                s_hist, idxs[:, None], axis=1)[:, 0] - s_hist[:, 0]
            st_better = ((st_jerk < rl_jerk) & (st_dist > rl_dist)) \
                | (rl_dist == 0.0)
            if remember:
                # hysteresis (dqn.py:176-197): after an ST tick, ST keeps
                # control unless RL is strictly better on BOTH criteria
                rl_better = (rl_jerk < st_jerk) & (rl_dist > st_dist)
                st_better = jnp.where(last_take, ~rl_better, st_better)
            # degenerate smoothed path -> stick with RL (dqn.py:166-169)
            st_better = st_better & (fine_len > 1)
            take = take | (~take & st_better)

        speed = jnp.where(take, st_speed, rl_speed)
        return speed.astype(states.ego_speed.dtype), \
            take.astype(jnp.float32), take

    if remember:
        @jax.jit
        def control(states: HighwayState, carry):
            speed, take_f, take = _control(states, carry)
            return (speed, take_f), take

        def init_carry(batch: int):
            return jnp.zeros((batch,), bool)
    else:
        @jax.jit
        def control(states: HighwayState):
            speed, take_f, _ = _control(
                states, jnp.zeros_like(states.ego_speed, bool))
            return speed, take_f

        init_carry = None

    def batch_stats(stats) -> Dict[str, np.ndarray]:
        ticks = np.maximum(np.asarray(stats.ticks), 1)
        return {"percent st solver":
                np.asarray(stats.aux_sum) / ticks}

    return control, init_carry, batch_stats
