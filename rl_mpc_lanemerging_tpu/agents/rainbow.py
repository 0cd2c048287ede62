"""Rainbow trainer for the discrete-jerk policy.

The reference's TRAIN_DQN/RESUME_DQN/EVALUATE_DQN tasks run the
``autonomous-learning-library`` Rainbow preset (reference: rainbow.py:23-106
and main.py:21-31); the preset internals live outside the repo, so per
SURVEY §7.3 this trainer re-derives the published Rainbow recipe on our
batched env: C51 categorical targets with the distributional projection,
NoisyNet exploration (no epsilon), Double-style action selection from the
online network, prioritized replay, and the same lr-drop "extended" retrain
pipeline (rainbow.py:85-106).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import Settings
from ..envs.merge_env import EnvKind, MergeEnvState, env_reset, env_step
from ..models.rainbow import RainbowNet
from ..rl import replay as rb
from ..rl.obs import state_vector
from ..sim.world import WorldState

__all__ = ["RainbowTrainState", "make_train_state", "train_round",
           "greedy_controller", "train", "evaluate"]

NUM_ATOMS = 51
# support spans the reference's Double-DQN target clip range
# (reference dqn.py:698: targets clipped to [-20, 10]); a crash return
# of -10 plus accumulated time/jerk penalties lands inside, not on the
# edge atom
V_MIN, V_MAX = -20.0, 10.0
RAINBOW_BATCH = 64
RAINBOW_DISCOUNT = 0.99
REPLAY_START = 2000
N_STEP = 3                    # published Rainbow n-step horizon
BETA_START = 0.4              # PER importance-sampling anneal start
BETA_FRAMES = 2e6             # frames to reach beta = 1


class NStepStage(NamedTuple):
    """Sliding window of the last N_STEP transitions per scenario; the
    oldest entry is emitted as an n-step transition each tick once the
    window is full (standard n-step staging, vectorized over the batch).
    Window index 0 = oldest."""

    obs: jax.Array        # (B, n, D)
    action: jax.Array     # (B, n) int32
    reward: jax.Array     # (B, n)
    next_obs: jax.Array   # (B, n, D)
    terminal: jax.Array   # (B, n) bool
    valid: jax.Array      # (B, n) bool
    fill: jax.Array       # () int32, entries appended so far (capped at n)


def init_stage(batch: int, obs_dim: int, n: int = N_STEP) -> NStepStage:
    return NStepStage(
        obs=jnp.zeros((batch, n, obs_dim)),
        action=jnp.zeros((batch, n), jnp.int32),
        reward=jnp.zeros((batch, n)),
        next_obs=jnp.zeros((batch, n, obs_dim)),
        terminal=jnp.zeros((batch, n), bool),
        valid=jnp.zeros((batch, n), bool),
        fill=jnp.zeros((), jnp.int32))


def stage_push(stage: NStepStage, tr) -> NStepStage:
    """Shift the window left and append this tick's transition."""
    def shift(w, new):
        return jnp.concatenate([w[:, 1:], new[:, None]], axis=1)

    return NStepStage(
        obs=shift(stage.obs, tr["obs"]),
        action=shift(stage.action, tr["action"].astype(jnp.int32)),
        reward=shift(stage.reward, tr["reward"]),
        next_obs=shift(stage.next_obs, tr["next_obs"]),
        terminal=shift(stage.terminal, tr["terminal"]),
        valid=shift(stage.valid, tr["valid"]),
        fill=jnp.minimum(stage.fill + 1, stage.obs.shape[1]))


def nstep_head(stage: NStepStage, gamma: float):
    """Emit the window head as an n-step transition.

    Accumulation stops at the first terminal (transition ends the episode,
    no bootstrap) or the first invalid entry (episode boundary without a
    terminal — timeout/warmup — bootstrap from the last in-episode state).
    Returns (obs, action, R, next_obs_K, terminal, gamma^K, valid).
    """
    n = stage.obs.shape[1]
    k = jnp.arange(n)
    big = jnp.asarray(n, jnp.int32)
    first_term = jnp.min(jnp.where(stage.terminal, k, big), axis=1)
    first_inval = jnp.min(jnp.where(~stage.valid, k, big), axis=1)
    # K = steps accumulated (1..n)
    K = jnp.minimum(jnp.minimum(first_term + 1, first_inval),
                    big).astype(jnp.int32)
    K = jnp.maximum(K, 1)
    gammas = gamma ** k.astype(stage.reward.dtype)
    take = k[None, :] < K[:, None]
    R = jnp.sum(jnp.where(take, gammas[None, :] * stage.reward, 0.0),
                axis=1)
    rows = jnp.arange(stage.obs.shape[0])
    next_obs = stage.next_obs[rows, K - 1]
    terminal = first_term < first_inval                 # ended by terminal
    discount = gamma ** K.astype(stage.reward.dtype)
    valid = stage.valid[:, 0] & (stage.fill >= n)
    return (stage.obs[:, 0], stage.action[:, 0], R, next_obs, terminal,
            discount, valid)


class RainbowTrainState(NamedTuple):
    params: dict
    target_params: dict
    opt_state: optax.OptState
    replay: rb.Replay
    env: MergeEnvState
    stage: NStepStage
    rng: jax.Array
    episodes: jax.Array
    frames: jax.Array


def _net(cfg: Settings) -> RainbowNet:
    return RainbowNet(num_actions=len(cfg.JERK_VALUES_DQN),
                      num_atoms=NUM_ATOMS)


def _support():
    return jnp.linspace(V_MIN, V_MAX, NUM_ATOMS)


def make_train_state(cfg: Settings, world: WorldState, rng: jax.Array,
                     lr: float | None = None,
                     wait_before_start: float = 20.0,
                     init_params=None) -> RainbowTrainState:
    net = _net(cfg)
    rng, k = jax.random.split(rng)
    params = init_params if init_params is not None \
        else net.init(k, jnp.zeros((1, cfg.obs_dim)))
    lr = lr if lr is not None else cfg.LEARNING_RATE
    opt_state = optax.adam(lr).init(params)
    replay = rb.init_replay(cfg.REPLAY_BUFFER_SIZE, cfg.obs_dim,
                            discrete=True)
    env = env_reset(world, cfg, wait_before_start=wait_before_start)
    batch = world.ego_arc.shape[0]
    return RainbowTrainState(params=params, target_params=params,
                             opt_state=opt_state, replay=replay, env=env,
                             stage=init_stage(batch, cfg.obs_dim),
                             rng=rng,
                             episodes=jnp.zeros((), jnp.int32),
                             frames=jnp.zeros((), jnp.int32))


def _categorical_loss(params, target_params, batch, rng, cfg: Settings,
                      weights=None):
    """C51 cross-entropy with the projected target distribution.

    ``batch["discount"]`` carries gamma^K for n-step transitions;
    ``weights`` are the PER importance-sampling corrections."""
    net = _net(cfg)
    z = _support()
    k1, k2 = jax.random.split(rng)

    logits_next = net.apply(target_params, batch["next_obs"], rng=None)
    probs_next = jax.nn.softmax(logits_next, axis=-1)
    # choose next action by expected value from the online net
    logits_online = net.apply(params, batch["next_obs"], rng=None)
    q_online = jnp.sum(jax.nn.softmax(logits_online, axis=-1) * z, axis=-1)
    a_star = jnp.argmax(q_online, axis=-1)
    p_next = jnp.take_along_axis(
        probs_next, a_star[:, None, None], axis=1)[:, 0]   # (B, atoms)

    # distributional Bellman projection (n-step: R + gamma^K Z)
    not_term = 1.0 - batch["terminal"].astype(z.dtype)
    disc = batch["discount"].astype(z.dtype)
    tz = jnp.clip(batch["reward"][:, None]
                  + disc[:, None] * not_term[:, None] * z[None, :],
                  V_MIN, V_MAX)
    dz = (V_MAX - V_MIN) / (NUM_ATOMS - 1)
    b = (tz - V_MIN) / dz
    lo = jnp.floor(b).astype(jnp.int32)
    hi = jnp.ceil(b).astype(jnp.int32)
    # distribute probability mass to neighbors (handle lo == hi)
    eq = (lo == hi).astype(z.dtype)
    m = jnp.zeros_like(p_next)
    w_lo = p_next * (hi.astype(z.dtype) - b + eq)
    w_hi = p_next * (b - lo.astype(z.dtype))
    rows = jnp.arange(p_next.shape[0])[:, None]
    m = m.at[rows, lo].add(w_lo)
    m = m.at[rows, jnp.clip(hi, 0, NUM_ATOMS - 1)].add(w_hi)

    def loss_fn(p):
        logits = net.apply(p, batch["obs"], rng=k1)
        logp = jax.nn.log_softmax(logits, axis=-1)
        logp_a = jnp.take_along_axis(
            logp, batch["action"][:, None, None], axis=1)[:, 0]
        ce = -jnp.sum(m * logp_a, axis=-1)
        w = weights if weights is not None else jnp.ones_like(ce)
        return jnp.mean(w * ce), ce

    return loss_fn


def _grad_step(params, target_params, opt_state, batch, rng, lr,
               cfg: Settings, weights=None):
    loss_fn = _categorical_loss(params, target_params, batch, rng, cfg,
                                weights=weights)
    (loss, ce), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    updates, opt_state = optax.adam(lr).update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss, ce


@functools.partial(jax.jit, static_argnames=("cfg", "lr", "env_ticks",
                                             "grad_steps",
                                             "wait_before_start"))
def train_round(state: RainbowTrainState, cfg: Settings, lr: float,
                env_ticks: int = 64, grad_steps: int = 16,
                wait_before_start: float = 20.0,
                epsilon: float = 0.0) -> RainbowTrainState:
    net = _net(cfg)
    z = _support()
    n_act = len(cfg.JERK_VALUES_DQN)
    init_pri = jnp.asarray(cfg.PER_MAX_PRIORITY ** cfg.PER_ALPHA)

    def collect(carry, _):
        env, stage, replay, rng, episodes, frames = carry
        rng, k_noise, k_eps, k_act = jax.random.split(rng, 4)
        # NoisyNet exploration: noisy forward pass, greedy over E[Z];
        # plus epsilon-greedy on top (the reference's custom trainer's
        # staircase-epsilon, dqn.py:275-276 — NoisyNet noise alone
        # collapses to a do-nothing local optimum on this env)
        logits = net.apply(state.params, env.obs, rng=k_noise)
        q = jnp.sum(jax.nn.softmax(logits, axis=-1) * z, axis=-1)
        action = jnp.argmax(q, axis=-1).astype(jnp.int32)
        b = action.shape[0]
        action = jnp.where(
            jax.random.uniform(k_eps, (b,)) < epsilon,
            jax.random.randint(k_act, (b,), 0, n_act, jnp.int32),
            action)
        env, tr = env_step(env, action, cfg, EnvKind.JERK,
                           max_episode_length=cfg.MAX_EPISODE_LENGTH,
                           wait_before_start=wait_before_start)
        # n-step staging: push this tick, emit the window head
        stage = stage_push(stage, tr)
        obs0, act0, ret_n, next_n, term_n, disc_n, valid_n = nstep_head(
            stage, RAINBOW_DISCOUNT)
        replay = rb.add_batch(replay, obs0, next_n, act0, ret_n, term_n,
                              valid_n, init_pri, discount=disc_n)
        episodes = episodes + jnp.sum(tr["done"]).astype(jnp.int32)
        frames = frames + jnp.sum(tr["valid"]).astype(jnp.int32)
        return (env, stage, replay, rng, episodes, frames), None

    (env, stage, replay, rng, episodes, frames), _ = jax.lax.scan(
        collect, (state.env, state.stage, state.replay, state.rng,
                  state.episodes, state.frames), None, length=env_ticks)

    # PER importance-sampling anneal (Schaul et al.: beta -> 1)
    beta = BETA_START + (1.0 - BETA_START) * jnp.minimum(
        frames.astype(jnp.float32) / BETA_FRAMES, 1.0)

    def learn(carry, _):
        params, opt_state, replay, rng = carry
        rng, k_s, k_n = jax.random.split(rng, 3)
        idx, batch, weights = rb.sample_with_weights(
            replay, k_s, RAINBOW_BATCH, beta)
        if not cfg.USE_PRIORITIZED_ER:
            weights = None
        params, opt_state, loss, ce = _grad_step(
            params, opt_state=opt_state, batch=batch, rng=k_n, lr=lr,
            cfg=cfg, target_params=state.target_params, weights=weights)
        if cfg.USE_PRIORITIZED_ER:
            replay = rb.update_priorities(replay, idx, ce, cfg)
        return (params, opt_state, replay, rng), None

    def do_learn(args):
        (params, opt_state, replay, rng), _ = (args, None)
        (params, opt_state, replay, rng), _ = jax.lax.scan(
            learn, (params, opt_state, replay, rng), None,
            length=grad_steps)
        return params, opt_state, replay, rng

    params, opt_state, replay, rng = jax.lax.cond(
        replay.size >= REPLAY_START, do_learn,
        lambda a: a, (state.params, state.opt_state, replay, rng))

    return state._replace(params=params, opt_state=opt_state,
                          replay=replay, env=env, stage=stage, rng=rng,
                          episodes=episodes, frames=frames)


def greedy_controller(params, cfg: Settings):
    """Greedy eval controller mapping action -> jerk -> speed command
    (reference rainbow.py:75-79 + control.py:160-179)."""
    net = _net(cfg)
    z = _support()
    table = jnp.asarray(cfg.JERK_VALUES_DQN)

    def control(states):
        obs = jax.vmap(lambda s: state_vector(s, cfg))(states)
        logits = net.apply(params, obs, rng=None)
        q = jnp.sum(jax.nn.softmax(logits, axis=-1) * z, axis=-1)
        jerk = table[jnp.argmax(q, axis=-1)]
        a = jnp.clip(states.ego_accel + jerk * cfg.TICK_LENGTH,
                     cfg.MAX_NEGATIVE_ACCELERATION,
                     cfg.MAX_POSITIVE_ACCELERATION)
        return jnp.clip(states.ego_speed + a * cfg.TICK_LENGTH,
                        0.0, cfg.MAX_SPEED)

    return control


# ---------------------------------------------------------------------------
# task drivers (reference rainbow.py:85-106, main.py:21-31)
# ---------------------------------------------------------------------------

EPS_END = 0.1   # reference library preset final exploration (see ADVICE r3)


def _eval_greedy(cfg, params, num_episodes=512):
    """Greedy-policy evaluation at EVALUATION_TICK_LENGTH (the batched
    equivalent of reference dqn.py:282-285)."""
    from .. import tasks
    eval_cfg = cfg.replace(TICK_LENGTH=cfg.EVALUATION_TICK_LENGTH)
    controller = jax.jit(greedy_controller(params, eval_cfg))
    agg = tasks.evaluate_controller(
        eval_cfg, controller, num_episodes=num_episodes,
        max_episode_length=cfg.EVALUATION_EPISODE_LENGTH, verbose=False)
    avg = agg.get_stat_averages()
    return (avg["crashed"], avg["merged"], avg["mean_abs_jerk"],
            avg["time_to_merge"])


def _train_frames(cfg, state, num_frames, lr, verbose=True, run=None,
                  eps_start=1.0, eval_every_rounds=10, best=None):
    """Advance training to ``num_frames`` valid env frames, refreshing the
    target network every TARGET_NET_FREEZE_PERIOD *episodes* (reference
    dqn.py:278-280 — the trainer this pipeline mirrors refreshes on an
    episode cadence, not a round cadence).

    ``eps_start`` lets resumed / fine-tuning stages (lr/10 extended,
    RESUME_DQN) start the anneal from an already-low epsilon instead of
    re-burning half the budget on near-random experience; the reference's
    extended rainbow stage explores via NoisyNets only (rainbow.py:63-67).
    ``best`` tracks the best-eval parameter snapshot like the DDPG trainer.
    """
    from .budget import frame_budget_rounds
    ticks_per_round = 200
    batch = state.env.obs.shape[0]
    frames0 = int(state.frames)
    last_refresh_bucket = int(state.episodes) // cfg.TARGET_NET_FREEZE_PERIOD
    # learner cadence: match the reference's TRAINING_STEPS_PER_EPISODE
    # (8) grad steps per episode (shared helper; the old fixed 16/round
    # left the net ~100x undertrained)
    from .budget import grad_steps_per_round
    grad_steps = grad_steps_per_round(cfg.TRAINING_STEPS_PER_EPISODE,
                                      batch, ticks_per_round)

    def do_eval(tag=""):
        # 1024-episode selection evals: at 512 the crash SEM (~0.006 at
        # the 0.02 level) is larger than the 0.01-band differences the
        # selection needs to discriminate — the r4 "crash 0.0" snapshots
        # measured 0.038 at the 4000-episode recording eval
        crash, merge, jerk, t_merge = _eval_greedy(cfg, state.params,
                                                   num_episodes=1024)
        if verbose:
            print(f"  [eval @ {int(state.frames)} frames{tag}] "
                  f"crash={crash:.4f} merge={merge:.4f} jerk={jerk:.3f} "
                  f"t_merge={t_merge:.1f}", flush=True)
        if run is not None:
            run.log_scalars(int(state.frames),
                            {"eval_crash": crash, "eval_merge": merge,
                             "eval_jerk": jerk, "eval_t_merge": t_merge})
        if best is not None:
            from .budget import snapshot_score
            score = snapshot_score(crash, merge, jerk, t_merge)
            if best.get("score") is None or score < best["score"]:
                best["score"] = score
                best["params"] = state.params
                best["frames"] = int(state.frames)

    evaluated = False
    for r in frame_budget_rounds(num_frames, ticks_per_round * batch):
        # epsilon-greedy anneal eps_start -> EPS_END over the first half
        # of the frame budget (staircase-equivalent of reference dqn.py:275)
        frac = min((int(state.frames) - frames0) / (num_frames * 0.5), 1.0)
        eps = eps_start + (EPS_END - eps_start) * frac
        state = train_round(state, cfg, lr, env_ticks=ticks_per_round,
                            grad_steps=grad_steps, epsilon=eps)
        episodes = int(state.episodes)         # syncs; frame check needs it
        bucket = episodes // cfg.TARGET_NET_FREEZE_PERIOD
        if bucket != last_refresh_bucket:
            state = state._replace(target_params=state.params)
            last_refresh_bucket = bucket
        frames = int(state.frames)
        evaluated = False
        if r % 10 == 0 or frames - frames0 >= num_frames:
            if verbose:
                print(f"  round {r} frames={frames}/{int(num_frames)} "
                      f"episodes={episodes}", flush=True)
            if run is not None:
                run.log_scalars(frames, {"episodes": episodes, "lr": lr})
        if eval_every_rounds and (r + 1) % eval_every_rounds == 0:
            do_eval()
            evaluated = True
        if frames - frames0 >= num_frames:
            break
    state = jax.block_until_ready(state)
    # mirror the DDPG guard: a caller disabling periodic eval
    # (eval_every_rounds=0) must not pay a final selection eval either
    if eval_every_rounds and best is not None and not evaluated:
        do_eval(tag=", final")
    return state


def train(cfg: Settings, num_frames: float = 1e6, resume: bool = False,
          verbose: bool = True, record_csv: bool = True):
    """``train_rainbow_all_with_lr_drop`` (reference rainbow.py:85-106)."""
    from .. import tasks
    from ..checkpoint import load_params, save_params
    from ..rundir import setup_run_dir

    run = setup_run_dir(cfg)
    worlds = tasks.make_worlds(cfg)
    rng = tasks.seed_key(cfg)
    init = load_params(cfg.MODEL_NAME)["q_dist"] if resume else None
    state = make_train_state(cfg, worlds, rng, lr=cfg.LEARNING_RATE,
                             init_params=init)
    best: dict = {}
    state = _train_frames(cfg, state, num_frames, cfg.LEARNING_RATE,
                          verbose, run=run,
                          eps_start=EPS_END if resume else 1.0, best=best)
    stage1 = best.get("params") if best.get("params") is not None \
        else state.params
    save_params(run.path, {"q_dist": stage1})

    final = stage1
    if not resume:
        lr2 = cfg.LEARNING_RATE / 10.0
        cfg2 = cfg.replace(LOG_DIR=cfg.LOG_DIR + "_extended")
        run2 = setup_run_dir(cfg2, snapshot_src=False)
        state2 = make_train_state(cfg2, tasks.make_worlds(cfg2),
                                  jax.random.split(rng)[0], lr=lr2,
                                  init_params=stage1)
        state2 = _train_frames(cfg2, state2, num_frames, lr2, verbose,
                               run=run2, eps_start=EPS_END, best=best)
        final = best.get("params") if best.get("params") is not None \
            else state2.params
        save_params(run2.path, {"q_dist": final})
        state = state2

    if verbose and best.get("score") is not None:
        print(f"  selected snapshot @ {best['frames']} frames "
              f"(crash={best['score'][1]:.4f} jerk={best['score'][2]:.3f})",
              flush=True)
    evaluate(cfg, params=final, record_csv=record_csv)
    return state


def evaluate(cfg: Settings, params=None, verbose: bool = True,
             record_csv: bool = True):
    from .. import tasks
    from ..checkpoint import load_params
    if params is None:
        params = load_params(cfg.MODEL_NAME)["q_dist"]
    controller = jax.jit(greedy_controller(params, cfg))
    agg = tasks.evaluate_controller(cfg, controller, verbose=verbose)
    if verbose:
        agg.print_stats()
    agg.save_plots(f"runs/{cfg.LOG_DIR}")
    if record_csv:
        agg.add_csv_data()
    return agg
