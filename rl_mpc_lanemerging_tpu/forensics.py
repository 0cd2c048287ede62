"""Crash forensics: capture, dump, and offline replay of crashing episodes.

Re-design of the reference's only debugging harness for the 0-crash claim:
crashing episodes pickle their full state history (reference
stats.py:75-77), and ``replay_crash`` re-solves the planner from every
saved state and renders the s-t obstacle/path plots (reference
st.py:827-859 ``replay_crash``/``plot_crash``).

Here the history is recorded on-device as a (B, T, ...) ``HighwayState``
pytree (sim.episode.run_episode_batch(record_history=True)); crashing
scenarios are sliced out host-side and written as one pickle per crash.
"""

from __future__ import annotations

import logging
import os
import pickle
from typing import List, Optional

import numpy as np

from .config import Settings
from .prediction import HighwayState

__all__ = ["extract_crash_histories", "dump_crashes", "load_crash",
           "replay_crash", "plot_crash", "plot_rollouts"]

logger = logging.getLogger(__name__)


def extract_crash_histories(stats, history: HighwayState
                            ) -> List[List[HighwayState]]:
    """Slice the crashing scenarios' state sequences out of a batched
    history pytree.  Returns a list (one per crash) of per-tick
    HighwayStates (numpy leaves), trimmed to the episode's tick count."""
    crashed = np.asarray(stats.crashed)
    ticks = np.asarray(stats.ticks)
    hist_np = [np.asarray(x) for x in history]
    out = []
    for b in np.nonzero(crashed)[0]:
        n = int(ticks[b])
        states = [HighwayState(*(leaf[b, t] for leaf in hist_np))
                  for t in range(n)]
        out.append(states)
    return out


def dump_crashes(stats, history, run_dir: str = ".",
                 tag: str = "") -> List[str]:
    """Pickle each crashing episode's state history (reference
    stats.py:75-77 ``crashed_state_history.pkl``; one file per crash here
    since a batch can contain several).  ``tag`` disambiguates rounds so
    successive batches don't overwrite each other's dumps."""
    paths = []
    os.makedirs(run_dir, exist_ok=True)
    for i, states in enumerate(extract_crash_histories(stats, history)):
        path = os.path.join(run_dir,
                            f"crashed_state_history_{tag}{i}.pkl")
        with open(path, "wb") as fh:
            pickle.dump(states, fh)
        logger.warning("Crash captured: %d states -> %s", len(states), path)
        paths.append(path)
    return paths


def load_crash(path: str) -> List[HighwayState]:
    with open(path, "rb") as fh:
        return pickle.load(fh)


def plot_crash(states: List[HighwayState], cfg: Settings,
               out_dir: Optional[str] = None, prefix: str = "crash"):
    """Re-solve the planner from each saved state and render the s-t
    obstacle field with the planned path (reference st.py:850-859).
    Returns the list of written image paths (empty if matplotlib is
    unavailable)."""
    import jax.numpy as jnp

    from .planner.mpc import plan_st

    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:                     # pragma: no cover
        logger.warning("matplotlib unavailable; skipping crash plots")
        return []

    out_dir = out_dir or "."
    os.makedirs(out_dir, exist_ok=True)
    written = []
    for i, state in enumerate(states):
        dev_state = HighwayState(*(jnp.asarray(x) for x in state))
        plan = plan_st(dev_state, cfg, dtype=jnp.float64)
        obstacles = np.asarray(plan.grid.obstacles)
        s_values = np.asarray(plan.grid.s_values)
        t_values = np.asarray(plan.grid.t_values)
        seq = np.asarray(plan.s_sequence)
        valid = int(plan.valid_len)

        nz_t, nz_s = np.nonzero(obstacles)
        fig, ax = plt.subplots(figsize=(6, 6))
        ax.scatter(t_values[nz_t], s_values[nz_s], s=1, c="tab:blue")
        ax.plot(t_values[:valid], seq[:valid], c="red")
        ax.set_xlabel("t")
        ax.set_ylabel("s")
        ax.set_title(f"{prefix} state {i} "
                     f"({'complete' if valid == len(seq) else 'trimmed'})")
        path = os.path.join(out_dir, f"{prefix}_{i:03d}.png")
        fig.savefig(path, dpi=100)
        plt.close(fig)
        written.append(path)
    return written


def replay_crash(path: str, cfg: Settings, out_dir: Optional[str] = None):
    """Offline repro harness (reference st.py:827-847): load a crash dump,
    re-solve every state, report which states the solver already declared
    doomed, and render the plots."""
    states = load_crash(path)
    import jax.numpy as jnp

    from .planner.mpc import plan_st

    doomed = []
    for i, state in enumerate(states):
        dev_state = HighwayState(*(jnp.asarray(x) for x in state))
        plan = plan_st(dev_state, cfg, dtype=jnp.float64)
        incomplete = int(plan.valid_len) < plan.s_sequence.shape[0]
        doomed.append(incomplete)
        if incomplete:
            logger.warning("state %d/%d: solver finds crash inevitable",
                           i, len(states))
    plots = plot_crash(states, cfg,
                       out_dir=out_dir or os.path.dirname(path) or ".")
    return doomed, plots


def plot_rollouts(policy, cfg: Settings, out_dir: str,
                  num_states: int = 4, warm_ticks: int = 40):
    """Visualize the RL policy's virtual rollouts (reference
    ddpg.py:120-162 ``plot_rollouts``): for a handful of mid-merge
    states, roll the policy ROLLOUT_LENGTH steps through the forecaster
    and render (a) the predicted car positions per virtual step (red ego,
    green neighbors — reference prediction.py:144-160 ``plot_state``)
    and (b) the planner's s-t path re-solved from the start state and
    from each rollout state (reference's ``st_<j>`` / ``rollout_st_<j>_<i>``
    figures).  Self-contained: drives a small world batch to the merge
    region first, since the reference passed crash states in by hand.

    Returns the list of written image paths ([] if matplotlib missing).
    """
    import jax
    import jax.numpy as jnp

    from .planner.mpc import plan_st
    from .prediction import get_closest_cars, predict_step_with_ego
    from .sim import init_world, sense_batch, warmup
    from .sim.world import add_ego, world_step

    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:                     # pragma: no cover
        logger.warning("matplotlib unavailable; skipping rollout plots")
        return []

    os.makedirs(out_dir, exist_ok=True)

    # drive a tiny batch into the merge region under the policy itself
    b = max(num_states, 4)
    keys = jax.random.split(jax.random.PRNGKey(int(cfg.SEED)
                                               if cfg.SEED != "Random"
                                               else 0), b)
    worlds = jax.vmap(lambda k: init_world(k, cfg, jnp.float32))(keys)
    worlds = warmup(worlds, cfg, int(20.0 / cfg.TICK_LENGTH))
    worlds = jax.vmap(add_ego)(worlds, jnp.full((b,), 15.0, jnp.float32))
    pol = jax.jit(policy)

    def _speed(states, jerk):
        a = jnp.clip(states.ego_accel + jerk * cfg.TICK_LENGTH,
                     cfg.MAX_NEGATIVE_ACCELERATION,
                     cfg.MAX_POSITIVE_ACCELERATION)
        return jnp.clip(states.ego_speed + a * cfg.TICK_LENGTH,
                        0.0, cfg.MAX_SPEED)

    step = jax.jit(lambda w, c: jax.vmap(
        lambda ww, cc: world_step(ww, cc, cfg))(w, c))
    for _ in range(warm_ticks):
        states = sense_batch(worlds, cfg)
        worlds = step(worlds, _speed(states, pol(states)))
    states = sense_batch(worlds, cfg)

    rollouts = max(cfg.ROLLOUT_LENGTH, 1)
    written = []
    roll_step = jax.jit(jax.vmap(
        lambda s, sp: predict_step_with_ego(
            s, sp, cfg.TICK_LENGTH, cfg, cfg.COMBINATION_MIN_DISTANCE)))

    # virtual rollout over the whole batch, recording each step
    history = [states]
    crashed = jnp.zeros((b,), bool)
    st = states
    for i in range(rollouts):
        jerk = pol(st)
        nxt, crash_now = roll_step(st, _speed(st, jerk))
        crashed = crashed | crash_now
        history.append(nxt)
        st = nxt

    def _one(tree, j):
        return jax.tree.map(lambda x: x[j], tree)

    for j in range(num_states):
        fig, ax = plt.subplots(figsize=(6, 4))
        for i, h in enumerate(history):
            s = _one(h, j)
            ax.scatter(i, float(s.ego_x), color="r", s=14)
            front, back = get_closest_cars(s)
            if bool(front[3]):
                ax.scatter(i, float(front[0]), color="g", s=10)
            if bool(back[3]):
                ax.scatter(i, float(back[0]), color="g", s=10)
        ax.set_xlabel("rollout step")
        ax.set_ylabel("x (m)")
        ax.set_title(f"policy rollout {j}"
                     + (" [crash predicted]" if bool(crashed[j]) else ""))
        path = os.path.join(out_dir, f"rollout_{j}.png")
        fig.savefig(path, dpi=100)
        plt.close(fig)
        written.append(path)

        # s-t planner view from the start state and each rollout state
        for i, h in enumerate(history):
            s = _one(h, j)
            plan = plan_st(s, cfg, dtype=jnp.float32)
            obstacles = np.asarray(plan.grid.obstacles)
            s_values = np.asarray(plan.grid.s_values)
            t_values = np.asarray(plan.grid.t_values)
            seq = np.asarray(plan.s_sequence)
            valid = int(plan.valid_len)
            nz_t, nz_s = np.nonzero(obstacles)
            fig, ax = plt.subplots(figsize=(5, 5))
            ax.scatter(t_values[nz_t], s_values[nz_s], s=1, c="tab:blue")
            ax.plot(t_values[:valid], seq[:valid], c="red")
            ax.set_xlabel("t")
            ax.set_ylabel("s")
            name = f"st_{j}.png" if i == 0 else f"rollout_st_{j}_{i}.png"
            path = os.path.join(out_dir, name)
            fig.savefig(path, dpi=100)
            plt.close(fig)
            written.append(path)
    logger.info("Saved %d rollout plots to %s", len(written), out_dir)
    return written
