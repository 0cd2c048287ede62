"""Best-eval snapshot selection + run-dir hygiene (round-4 additions).

The trainers keep the best periodic-eval parameter snapshot instead of
the final parameters (agents/budget.snapshot_score); run dirs rotate a
pre-existing scalars.csv so reruns never append mixed-schema rows
(rundir.setup_run_dir; r3 advisor finding).
"""

import os

from rl_mpc_lanemerging_tpu.agents.budget import snapshot_score


def test_crash_dominates_jerk():
    good = snapshot_score(0.0, 1.0, 0.8)
    crashy = snapshot_score(0.05, 0.95, 0.2)
    assert good < crashy


def test_high_merge_beats_do_nothing():
    # a 99.5%-merge policy with a few crashes must beat a never-merging
    # "safe" policy — the failure mode of a crash-first lexicographic rule
    merger = snapshot_score(0.005, 0.995, 0.4)
    parked = snapshot_score(0.0, 0.0, 0.05)
    assert merger < parked


def test_jerk_breaks_ties():
    smooth = snapshot_score(0.0, 1.0, 0.3)
    jerky = snapshot_score(0.0, 1.0, 0.5)
    assert smooth < jerky


def test_crash_outweighs_timeouts_5x():
    # 1% crash ~ 5% timeouts by construction; 1% crash beats 6% timeouts
    crashy = snapshot_score(0.01, 0.99, 0.0)
    slow6 = snapshot_score(0.0, 0.94, 0.0)
    slow4 = snapshot_score(0.0, 0.96, 0.0)
    assert crashy < slow6
    assert slow4 < crashy


def test_time_to_merge_penalized():
    """VERDICT r4 weak 1: on sparse traffic the reference's policies
    accept crash ~0.003 to merge in ~22 s; without a time term the
    selection preferred 0-crash snapshots that wait ~43 s.  At the
    damped trade (1 crash ~ 1000 s) the fast slightly-crashy policy must
    win without letting far-off-band crash rates buy speed."""
    ref_like = snapshot_score(0.003, 0.997, 0.29, t_merge=22.1)
    slow_safe = snapshot_score(0.0005, 0.9995, 0.37, t_merge=42.7)
    assert ref_like < slow_safe
    # ...but the time term must not buy crash rates far above the
    # reference band: 5% crash for a 20 s faster merge still loses
    reckless = snapshot_score(0.05, 0.95, 0.29, t_merge=22.1)
    assert slow_safe < reckless


def test_medium_regime_five_second_gap():
    # reference medium rows accept crash ~0.005 to merge ~5 s faster
    # (saved_data ddpg_medium3: crash 0.0054, t 22.2); the r5 weight must
    # prefer that profile over a 0-crash snapshot waiting 27.3 s
    ref_like = snapshot_score(0.005, 0.995, 0.44, t_merge=22.2)
    slow_safe = snapshot_score(0.0, 1.0, 0.35, t_merge=27.3)
    assert ref_like < slow_safe


def test_time_term_nan_and_default_safe():
    # never-merging policy: t_merge is NaN -> the timeout term alone
    # must carry the penalty (no NaN poisoning the score)
    parked = snapshot_score(0.0, 0.0, 0.05, t_merge=float("nan"))
    merger = snapshot_score(0.005, 0.995, 0.4, t_merge=25.0)
    assert merger < parked
    # 3-arg call (no time info) stays valid and matches t_merge=0
    assert snapshot_score(0.01, 0.99, 0.3) == \
        snapshot_score(0.01, 0.99, 0.3, t_merge=0.0)


def test_scalars_rotation_lazy(tmp_path, monkeypatch):
    """ADVICE r4: rotation happens on the first log_scalars write, not at
    setup_run_dir — an eval rerun that never logs scalars must leave the
    training scalars.csv untouched."""
    from rl_mpc_lanemerging_tpu.config import Settings
    from rl_mpc_lanemerging_tpu.rundir import setup_run_dir

    monkeypatch.chdir(tmp_path)
    cfg = Settings().replace(LOG_DIR="rotate_me")
    run = setup_run_dir(cfg, snapshot_src=False)
    run.log_scalars(1, {"a": 1.0})
    assert os.path.exists(tmp_path / "runs/rotate_me/scalars.csv")

    # an eval-style rerun that never writes scalars: no rotation
    setup_run_dir(cfg, snapshot_src=False)
    assert not os.path.exists(tmp_path / "runs/rotate_me/scalars.1.csv")
    with open(tmp_path / "runs/rotate_me/scalars.csv") as fh:
        assert fh.readline().strip() == "step,a"

    # a rerun that DOES log scalars rotates before its first write
    run3 = setup_run_dir(cfg, snapshot_src=False)
    run3.log_scalars(2, {"b": 2.0, "c": 3.0})   # fresh schema, own header
    assert os.path.exists(tmp_path / "runs/rotate_me/scalars.1.csv")
    with open(tmp_path / "runs/rotate_me/scalars.csv") as fh:
        assert fh.readline().strip() == "step,b,c"


def test_diag_yield_toggles_follower_disruption():
    """DIAG_YIELD_MODE diagnostics (VERDICT r3 item 6 A/B harness): with
    "never" highway cars assert priority unconditionally, so a crawling
    ego induces no follower disruption; with "always"/default a merged
    slow ego forces yielding (disruption > 0).  Production default stays
    between the two extremes by construction."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rl_mpc_lanemerging_tpu.config import Settings
    from rl_mpc_lanemerging_tpu.sim import init_world, run_episode_batch

    def disruption(mode):
        cfg = Settings().replace(DIAG_YIELD_MODE=mode)
        keys = jax.random.split(jax.random.PRNGKey(7), 8)
        w = jax.vmap(lambda k: init_world(k, cfg, jnp.float64))(keys)
        # crawl through the merge: maximally disruptive if cars yield
        controller = lambda state: jnp.full_like(state.ego_speed, 2.0)
        _, stats = run_episode_batch(w, cfg, controller)
        return float(np.sum(np.asarray(stats.sum_disruption)))

    d_never = disruption("never")
    d_default = disruption("default")
    d_always = disruption("always")
    assert d_never == 0.0
    assert d_always > 0.0
    assert d_default > 0.0
    assert d_always >= d_default >= d_never
