"""Rainbow completion tests: n-step returns, PER IS weights, learning sanity.

Round-1 verdict: Rainbow lacked n-step returns and importance-sampling
weights.  These tests pin the published-recipe semantics (Hessel et al.
2018; Schaul et al. 2016) and add optimization-direction checks that would
catch sign errors in the losses.
"""

import jax
import jax.numpy as jnp
import numpy as np

from rl_mpc_lanemerging_tpu.config import Settings
from rl_mpc_lanemerging_tpu.agents import rainbow
from rl_mpc_lanemerging_tpu.rl import replay as rb

CFG = Settings()
GAMMA = rainbow.RAINBOW_DISCOUNT


def _stage_from(rows):
    """rows: list of dicts with r, term, valid (oldest first); obs encode
    their index so gathers are checkable."""
    n = len(rows)
    d = 4
    obs = jnp.arange(n, dtype=jnp.float32)[None, :, None] * jnp.ones((1, n, d))
    next_obs = obs + 100.0
    return rainbow.NStepStage(
        obs=obs, action=jnp.zeros((1, n), jnp.int32),
        reward=jnp.asarray([[r["r"] for r in rows]], jnp.float32),
        next_obs=next_obs,
        terminal=jnp.asarray([[r["term"] for r in rows]]),
        valid=jnp.asarray([[r["valid"] for r in rows]]),
        fill=jnp.asarray(n, jnp.int32))


def test_nstep_full_window_accumulation():
    stage = _stage_from([{"r": 1.0, "term": False, "valid": True},
                         {"r": 2.0, "term": False, "valid": True},
                         {"r": 4.0, "term": False, "valid": True}])
    obs0, a0, R, next_n, term, disc, valid = rainbow.nstep_head(stage, GAMMA)
    np.testing.assert_allclose(float(R[0]),
                               1.0 + GAMMA * 2.0 + GAMMA ** 2 * 4.0,
                               rtol=1e-6)
    np.testing.assert_allclose(float(disc[0]), GAMMA ** 3, rtol=1e-6)
    assert not bool(term[0])
    assert bool(valid[0])
    np.testing.assert_allclose(np.asarray(next_n[0]),
                               np.full(4, 102.0))   # next_obs of entry 2
    np.testing.assert_allclose(np.asarray(obs0[0]), np.zeros(4))


def test_nstep_stops_at_terminal():
    stage = _stage_from([{"r": 1.0, "term": False, "valid": True},
                         {"r": 2.0, "term": True, "valid": True},
                         {"r": 99.0, "term": False, "valid": True}])
    _, _, R, next_n, term, disc, valid = rainbow.nstep_head(stage, GAMMA)
    np.testing.assert_allclose(float(R[0]), 1.0 + GAMMA * 2.0, rtol=1e-6)
    assert bool(term[0])                 # no bootstrap past a crash/arrival
    np.testing.assert_allclose(float(disc[0]), GAMMA ** 2, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(next_n[0]), np.full(4, 101.0))


def test_nstep_stops_at_episode_boundary_without_terminal():
    # timeout/warmup boundary: entry 1 invalid -> 1-step transition that
    # still bootstraps (terminal=False)
    stage = _stage_from([{"r": 1.0, "term": False, "valid": True},
                         {"r": 99.0, "term": False, "valid": False},
                         {"r": 99.0, "term": False, "valid": True}])
    _, _, R, next_n, term, disc, valid = rainbow.nstep_head(stage, GAMMA)
    np.testing.assert_allclose(float(R[0]), 1.0, rtol=1e-6)
    assert not bool(term[0])
    np.testing.assert_allclose(float(disc[0]), GAMMA, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(next_n[0]), np.full(4, 100.0))
    assert bool(valid[0])


def test_nstep_invalid_head_is_dropped():
    stage = _stage_from([{"r": 1.0, "term": False, "valid": False},
                         {"r": 2.0, "term": False, "valid": True},
                         {"r": 4.0, "term": False, "valid": True}])
    _, _, _, _, _, _, valid = rainbow.nstep_head(stage, GAMMA)
    assert not bool(valid[0])


def test_is_weights_match_schaul_formula():
    replay = rb.init_replay(8, 2, discrete=True)
    obs = jnp.zeros((4, 2))
    replay = rb.add_batch(replay, obs, obs, jnp.zeros((4,), jnp.int32),
                          jnp.zeros((4,)), jnp.zeros((4,), bool),
                          jnp.ones((4,), bool), 1.0)
    # skew one priority up
    replay = replay._replace(priority=replay.priority.at[0].set(4.0))
    key = jax.random.PRNGKey(0)
    idx, _, w = rb.sample_with_weights(replay, key, 256, beta=1.0)
    idx, w = np.asarray(idx), np.asarray(w)
    # manual: P(0)=4/7, P(i)=1/7; w_i = (N*P)^-1 normalized by max
    n = 4
    probs = np.where(idx == 0, 4.0 / 7.0, 1.0 / 7.0)
    expect = (n * probs) ** -1.0
    expect = expect / expect.max()
    np.testing.assert_allclose(w, expect, rtol=1e-5)
    # high-priority samples must get LOWER weight
    assert w[idx == 0].mean() < w[idx != 0].mean()


def test_categorical_loss_decreases_on_fixed_batch():
    """Optimization-direction sanity: repeated grad steps on one batch
    shrink the projected-distribution cross-entropy."""
    cfg = CFG
    net = rainbow._net(cfg)
    rng = jax.random.PRNGKey(0)
    params = net.init(rng, jnp.zeros((1, cfg.obs_dim)))
    import optax
    opt_state = optax.adam(1e-3).init(params)
    k = jax.random.PRNGKey(1)
    batch = dict(
        obs=jax.random.normal(k, (32, cfg.obs_dim)),
        next_obs=jax.random.normal(jax.random.PRNGKey(2),
                                   (32, cfg.obs_dim)),
        action=jax.random.randint(jax.random.PRNGKey(3), (32,), 0, 5),
        reward=jax.random.uniform(jax.random.PRNGKey(4), (32,), minval=-1,
                                  maxval=1),
        terminal=jnp.zeros((32,), bool),
        discount=jnp.full((32,), GAMMA))
    target = params
    losses = []
    for i in range(30):
        params, opt_state, loss, _ = rainbow._grad_step(
            params, target, opt_state, batch, jax.random.PRNGKey(10 + i),
            1e-3, cfg)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.9


def test_ddpg_update_directions():
    """Critic loss decreases; actor's Q under the critic increases."""
    from rl_mpc_lanemerging_tpu.agents import ddpg
    cfg = CFG
    actor, critic = ddpg._nets(cfg)
    k = jax.random.PRNGKey(0)
    ap = actor.init(k, jnp.zeros((1, cfg.obs_dim)))
    cp = critic.init(jax.random.PRNGKey(1), jnp.zeros((1, cfg.obs_dim)),
                     jnp.zeros((1, 1)))
    import optax
    ao = optax.adam(1e-3).init(ap)
    co = optax.adam(1e-3).init(cp)
    actions = jax.random.uniform(jax.random.PRNGKey(4), (64,), minval=-5,
                                 maxval=5)
    batch = dict(
        obs=jax.random.normal(jax.random.PRNGKey(2), (64, cfg.obs_dim)),
        next_obs=jax.random.normal(jax.random.PRNGKey(3),
                                   (64, cfg.obs_dim)),
        action=actions,
        # reward increases with the action, so the optimal deterministic
        # policy pushes actions up — a signed, learnable objective
        reward=actions / 5.0,
        terminal=jnp.ones((64,), bool))
    ta, tc = ap, cp

    def critic_mse(cp_, ap_):
        # all transitions terminal -> target is the raw reward
        tgt = batch["reward"]
        q = critic.apply(cp_, batch["obs"], batch["action"][:, None])
        return float(jnp.mean((q - tgt) ** 2))

    def actor_q(ap_, cp_):
        a = actor.apply(ap_, batch["obs"])
        return float(jnp.mean(critic.apply(cp_, batch["obs"], a)))

    mse0 = critic_mse(cp, ap)
    ap0 = ap
    for _ in range(25):
        ap, cp, ta, tc, ao, co = ddpg._update(cfg, 1e-3, ap, cp, ta, tc,
                                              ao, co, batch)
    assert critic_mse(cp, ap) < mse0
    # under the SAME final critic, the trained actor must score higher
    # than the initial actor (sign error in the actor loss would invert it)
    assert actor_q(ap, cp) > actor_q(ap0, cp)
