"""DDPG trainer for the continuous-jerk policy.

The reference trains DDPG through the ``autonomous-learning-library`` 0.5.3
preset on ``sumo-jerk-continuous-v0`` (reference: ddpg.py:24-117); the
preset internals live outside the repo, so per SURVEY §7.3 this trainer
re-derives standard DDPG (Lillicrap et al.): deterministic actor + Q
critic with polyak-averaged targets, Gaussian exploration noise, uniform
replay.  The reference's training *pipeline* is preserved: ``train`` for
num_frames, then learning-rate/10 and resume for another num_frames into a
"_extended" run (ddpg.py:96-117 ``train_ddpg_all_with_lr_drop``), then
evaluation.

Deviation (documented): the library's ``TimeFeature`` observation wrapper
(reference ddpg.py:41) is omitted — the policy sees the raw 20-d
observation vector.
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
from ..models.ddpg import DDPGActor, DDPGCritic
from ..rl import replay as rb
from ..rl.obs import state_vector
from ..sim.world import WorldState

__all__ = ["DDPGTrainState", "make_train_state", "train_round",
           "actor_controller", "train", "evaluate", "evaluate_combined"]

# Hyperparameters of the library preset, re-derived from the published
# algorithm (the reference passes only lr_q/lr_pi through, ddpg.py:49-53).
NOISE_SIGMA = 0.5            # exploration noise std (jerk units)
POLYAK = 0.005               # soft target update rate
DDPG_BATCH = 100
DDPG_DISCOUNT = 0.99
REPLAY_START = 2000
DDPG_REPLAY_CAPACITY = 2 ** 19


class DDPGTrainState(NamedTuple):
    actor_params: dict
    critic_params: dict
    target_actor: dict
    target_critic: dict
    actor_opt: optax.OptState
    critic_opt: optax.OptState
    replay: rb.Replay
    env: MergeEnvState
    rng: jax.Array
    episodes: jax.Array
    frames: jax.Array
    ret_acc: jax.Array      # (B,) running return of the in-flight episode
    ep_ret_sum: jax.Array   # () sum of completed-episode returns
    ep_ret_n: jax.Array     # () number of completed episodes (for the mean)


def _nets(cfg: Settings):
    actor = DDPGActor(action_low=cfg.MINIMUM_NEGATIVE_JERK,
                      action_high=cfg.MAXIMUM_POSITIVE_JERK)
    critic = DDPGCritic()
    return actor, critic


def make_train_state(cfg: Settings, world: WorldState, rng: jax.Array,
                     lr: float | None = None,
                     wait_before_start: float = 20.0,
                     init_params: tuple | None = None) -> DDPGTrainState:
    actor, critic = _nets(cfg)
    rng, k1, k2 = jax.random.split(rng, 3)
    dummy_obs = jnp.zeros((1, cfg.obs_dim))
    dummy_act = jnp.zeros((1, 1))
    if init_params is None:
        actor_params = actor.init(k1, dummy_obs)
        critic_params = critic.init(k2, dummy_obs, dummy_act)
    else:
        actor_params, critic_params = init_params
    lr = lr if lr is not None else cfg.LEARNING_RATE
    a_opt = optax.adam(lr).init(actor_params)
    c_opt = optax.adam(lr).init(critic_params)
    replay = rb.init_replay(DDPG_REPLAY_CAPACITY, cfg.obs_dim,
                            discrete=False)
    env = env_reset(world, cfg, wait_before_start=wait_before_start)
    batch = world.ego_arc.shape[0]
    return DDPGTrainState(
        actor_params=actor_params, critic_params=critic_params,
        target_actor=actor_params, target_critic=critic_params,
        actor_opt=a_opt, critic_opt=c_opt, replay=replay, env=env, rng=rng,
        episodes=jnp.zeros((), jnp.int32), frames=jnp.zeros((), jnp.int32),
        ret_acc=jnp.zeros((batch,)), ep_ret_sum=jnp.zeros(()),
        ep_ret_n=jnp.zeros(()))


def _update(cfg: Settings, lr: float, actor_params, critic_params,
            target_actor, target_critic, a_opt, c_opt, batch,
            axis_name: str | None = None):
    """One DDPG update.  With ``axis_name`` the gradients are pmean-reduced
    across the device mesh (data-parallel training, SURVEY §2.3), keeping
    every device's parameter copy identical."""
    actor, critic = _nets(cfg)
    act = batch["action"][:, None]

    next_a = actor.apply(target_actor, batch["next_obs"])
    q_next = critic.apply(target_critic, batch["next_obs"], next_a)
    target = batch["reward"] + DDPG_DISCOUNT \
        * jnp.where(batch["terminal"], 0.0, q_next)

    def critic_loss(p):
        q = critic.apply(p, batch["obs"], act)
        return jnp.mean((q - target) ** 2)

    c_grads = jax.grad(critic_loss)(critic_params)
    if axis_name is not None:
        c_grads = jax.lax.pmean(c_grads, axis_name)
    c_updates, c_opt = optax.adam(lr).update(c_grads, c_opt, critic_params)
    critic_params = optax.apply_updates(critic_params, c_updates)

    def actor_loss(p):
        a = actor.apply(p, batch["obs"])
        return -jnp.mean(critic.apply(critic_params, batch["obs"], a))

    a_grads = jax.grad(actor_loss)(actor_params)
    if axis_name is not None:
        a_grads = jax.lax.pmean(a_grads, axis_name)
    a_updates, a_opt = optax.adam(lr).update(a_grads, a_opt, actor_params)
    actor_params = optax.apply_updates(actor_params, a_updates)

    soft = lambda t, p: jax.tree.map(
        lambda a, b: (1 - POLYAK) * a + POLYAK * b, t, p)
    return (actor_params, critic_params, soft(target_actor, actor_params),
            soft(target_critic, critic_params), a_opt, c_opt)


def _train_round_impl(state: DDPGTrainState, cfg: Settings, lr: float,
                      env_ticks: int = 64, updates_per_tick: int = 64,
                      wait_before_start: float = 20.0,
                      axis_name: str | None = None) -> DDPGTrainState:
    """env_ticks batched env steps; ``updates_per_tick`` gradient updates
    per tick once the replay warms up.  The reference library does one
    update per environment frame (update_frequency=1); with B scenarios
    stepping per tick, updates_per_tick ~ B/2 keeps the updates-per-frame
    ratio in the same regime."""
    actor, _ = _nets(cfg)

    def tick(carry, _):
        state = carry
        (env, replay, rng) = (state.env, state.replay, state.rng)
        rng, k_noise = jax.random.split(rng)
        a_mean = actor.apply(state.actor_params, env.obs)[:, 0]
        noise = NOISE_SIGMA * jax.random.normal(k_noise, a_mean.shape)
        action = jnp.clip(a_mean + noise, cfg.MINIMUM_NEGATIVE_JERK,
                          cfg.MAXIMUM_POSITIVE_JERK)
        env, tr = env_step(env, action, cfg, EnvKind.CONTINUOUS_JERK,
                           max_episode_length=cfg.MAX_EPISODE_LENGTH,
                           wait_before_start=wait_before_start)
        replay = rb.add_batch(replay, tr["obs"], tr["next_obs"],
                              tr["action"], tr["reward"], tr["terminal"],
                              tr["valid"], 1.0)
        episodes = state.episodes + jnp.sum(tr["done"]).astype(jnp.int32)
        frames = state.frames + jnp.sum(tr["valid"]).astype(jnp.int32)

        # episode-return bookkeeping (training-curve observability)
        ret_acc = state.ret_acc + jnp.where(tr["valid"], tr["reward"], 0.0)
        done = tr["done"]
        ep_ret_sum = state.ep_ret_sum + jnp.sum(jnp.where(done, ret_acc,
                                                          0.0))
        ep_ret_n = state.ep_ret_n + jnp.sum(done)
        ret_acc = jnp.where(done, 0.0, ret_acc)

        def do_updates(args):
            rng, ap, cp, ta, tc, ao, co = args

            def upd(carry, _):
                rng, ap, cp, ta, tc, ao, co = carry
                rng, k = jax.random.split(rng)
                _, batch = rb.sample(replay, k, DDPG_BATCH)
                ap, cp, ta, tc, ao, co = _update(cfg, lr, ap, cp, ta, tc,
                                                 ao, co, batch,
                                                 axis_name=axis_name)
                return (rng, ap, cp, ta, tc, ao, co), None

            out, _ = jax.lax.scan(upd, args, None, length=updates_per_tick)
            return out

        args = (rng, state.actor_params, state.critic_params,
                state.target_actor, state.target_critic, state.actor_opt,
                state.critic_opt)
        (rng, actor_params, critic_params, target_actor, target_critic,
         a_opt, c_opt) = jax.lax.cond(
            replay.size >= REPLAY_START, do_updates, lambda a: a, args)

        return DDPGTrainState(
            actor_params=actor_params, critic_params=critic_params,
            target_actor=target_actor, target_critic=target_critic,
            actor_opt=a_opt, critic_opt=c_opt, replay=replay, env=env,
            rng=rng, episodes=episodes, frames=frames, ret_acc=ret_acc,
            ep_ret_sum=ep_ret_sum, ep_ret_n=ep_ret_n), None

    state, _ = jax.lax.scan(tick, state, None, length=env_ticks)
    return state


train_round = jax.jit(_train_round_impl,
                      static_argnames=("cfg", "env_ticks", "lr",
                                       "updates_per_tick",
                                       "wait_before_start", "axis_name"))


def make_sharded_train(cfg: Settings, mesh, rng: jax.Array, lr: float,
                       env_ticks: int = 200, updates_per_tick: int = 64,
                       init_params: tuple | None = None,
                       wait_before_start: float = 20.0):
    """Data-parallel trainer over the scenario mesh: each device owns a
    full local train state (envs + replay + a parameter copy); updates
    pmean their gradients so the copies stay identical (SURVEY §2.3
    actor/learner parallelism; the reference trains strictly
    single-process, dqn.py:272-354).

    Returns (global_state, round_fn) where round_fn advances every shard
    one train round.
    """
    from .. import tasks
    from ..parallel import sharded
    from ..parallel.mesh import SCENARIO_AXIS

    n = mesh.devices.size
    keys = jax.random.split(rng, n)
    locals_ = []
    for i in range(n):
        world = tasks.make_worlds(cfg.replace(SEED=int(cfg.SEED) + i
                                              if cfg.SEED != "Random"
                                              else cfg.SEED))
        locals_.append(make_train_state(
            cfg, world, keys[i], lr=lr, init_params=init_params,
            wait_before_start=wait_before_start))
        if init_params is None:
            # every shard must start from the same parameter copy (DP)
            init_params = (locals_[0].actor_params,
                           locals_[0].critic_params)
    gstate = sharded.shard_train_state(sharded.stack_states(locals_), mesh)

    body = functools.partial(
        _train_round_impl, cfg=cfg, lr=lr, env_ticks=env_ticks,
        updates_per_tick=updates_per_tick,
        wait_before_start=wait_before_start, axis_name=SCENARIO_AXIS)
    round_fn = sharded.sharded_train_round(body, mesh)
    return gstate, round_fn


def actor_jerk(actor_params, cfg: Settings):
    """HighwayState batch -> jerk actions (reference ddpg.py:83-87)."""
    actor, _ = _nets(cfg)

    def policy(states):
        obs = jax.vmap(lambda s: state_vector(s, cfg))(states)
        return actor.apply(actor_params, obs)[:, 0]

    return policy


def actor_controller(actor_params, cfg: Settings):
    """HighwayState batch -> speed commands via set_ego_jerk integration."""
    policy = actor_jerk(actor_params, cfg)

    def control(states):
        jerk = policy(states)
        a = jnp.clip(states.ego_accel + jerk * cfg.TICK_LENGTH,
                     cfg.MAX_NEGATIVE_ACCELERATION,
                     cfg.MAX_POSITIVE_ACCELERATION)
        return jnp.clip(states.ego_speed + a * cfg.TICK_LENGTH,
                        0.0, cfg.MAX_SPEED)

    return control


# ---------------------------------------------------------------------------
# task drivers (reference ddpg.py:96-117, main.py:23-40)
# ---------------------------------------------------------------------------

def _eval_actor(cfg: Settings, params, num_episodes: int):
    """Greedy-policy evaluation; returns (crash, merge, jerk) means
    (reference dqn.py:282-285 periodic eval at EVALUATION_PERIOD, run at
    EVALUATION_TICK_LENGTH / EVALUATION_EPISODE_LENGTH — the batched
    equivalent of sumo.change_step_size, sumo.py:65-68)."""
    from .. import tasks
    eval_cfg = cfg.replace(TICK_LENGTH=cfg.EVALUATION_TICK_LENGTH)
    controller = jax.jit(actor_controller(params, eval_cfg))
    agg = tasks.evaluate_controller(
        eval_cfg, controller, num_episodes=num_episodes,
        max_episode_length=cfg.EVALUATION_EPISODE_LENGTH, verbose=False)
    avg = agg.get_stat_averages()
    return (avg["crashed"], avg["merged"], avg["mean_abs_jerk"],
            avg["time_to_merge"])


def _train_frames(cfg: Settings, state: DDPGTrainState, num_frames: float,
                  lr: float, verbose: bool = True, run=None,
                  updates_per_tick: int = 64,
                  eval_every_rounds: int = 0,
                  eval_episodes: int = 2048,
                  best: dict | None = None) -> DDPGTrainState:
    # 2048-episode selection evals: at 512 a true-0.004-crash snapshot
    # measures 0/512 with ~13% probability, so min-over-evals selection
    # reliably "finds" lucky zeros whose 4000-episode recording eval
    # then lands at 0.002-0.006 (the phase-F medium_1/moderate_1 rows);
    # at 2048 that false-zero probability is ~3e-4
    """Advance ``num_frames`` frames.  With ``eval_every_rounds`` the actor
    is periodically evaluated and — model selection — the best-scoring
    (lowest crash, then lowest jerk, merge-complete) parameter snapshot is
    tracked in ``best`` (a dict with keys score/params, threaded through
    stages so the pipeline keeps one best across train + extended).  The
    reference keeps only the final parameters (ddpg.py:96-117); at this
    trainer's reduced frame budgets the late-training policy is noisy
    enough that the recorded row would otherwise depend on where the
    budget happens to stop."""
    from .budget import frame_budget_rounds
    ticks_per_round = 200
    batch = state.env.obs.shape[0]
    frames0 = int(state.frames)

    def do_eval(tag=""):
        crash, merge, jerk, t_merge = _eval_actor(cfg, state.actor_params,
                                                  eval_episodes)
        if verbose:
            print(f"  [eval @ {int(state.frames)} frames{tag}] "
                  f"crash={crash:.4f} merge={merge:.4f} "
                  f"jerk={jerk:.3f} t_merge={t_merge:.1f}", flush=True)
        if run is not None:
            run.log_scalars(int(state.frames),
                            {"eval_crash": crash, "eval_merge": merge,
                             "eval_jerk": jerk, "eval_t_merge": t_merge})
        if best is not None:
            from .budget import snapshot_score
            score = snapshot_score(crash, merge, jerk, t_merge)
            if best.get("score") is None or score < best["score"]:
                best["score"] = score
                best["params"] = (state.actor_params, state.critic_params)
                best["frames"] = int(state.frames)
                if verbose:
                    print(f"  [best so far: crash={crash:.4f} "
                          f"merge={merge:.4f} jerk={jerk:.3f} "
                          f"t_merge={t_merge:.1f}]", flush=True)

    evaluated_this_round = False
    for r in frame_budget_rounds(num_frames, ticks_per_round * batch):
        state = train_round(state, cfg, lr, env_ticks=ticks_per_round,
                            updates_per_tick=updates_per_tick)
        evaluated_this_round = False
        if r % 5 == 4 \
                or int(state.frames) - frames0 >= num_frames:
            state = jax.block_until_ready(state)
            n = max(float(state.ep_ret_n), 1.0)
            avg_ret = float(state.ep_ret_sum) / n
            # reset the return window so each log point is fresh
            state = state._replace(ep_ret_sum=jnp.zeros(()),
                                   ep_ret_n=jnp.zeros(()))
            if verbose:
                print(f"  round {r + 1} frames={int(state.frames)}"
                      f"/{int(num_frames)}"
                      f" episodes={int(state.episodes)}"
                      f" avg_return={avg_ret:.3f}", flush=True)
            if run is not None:
                run.log_scalars(int(state.frames),
                                {"episodes": int(state.episodes),
                                 "avg_return": avg_ret, "lr": lr})
        if eval_every_rounds and (r + 1) % eval_every_rounds == 0:
            do_eval()
            evaluated_this_round = True
        if int(state.frames) - frames0 >= num_frames:
            break
    state = jax.block_until_ready(state)
    # give the final parameters a chance to be the selected snapshot
    if eval_every_rounds and best is not None and not evaluated_this_round:
        do_eval(tag=", final")
    return state


def train(cfg: Settings, num_frames: float = 1e6, resume: bool = False,
          verbose: bool = True, eval_every_rounds: int = 5,
          record_csv: bool = True):
    """``train_ddpg_all_with_lr_drop`` (reference ddpg.py:96-117): train,
    then lr/10 + resume into an _extended run, then evaluate."""
    from .. import tasks
    from ..checkpoint import load_params, save_params
    from ..rundir import setup_run_dir

    run = setup_run_dir(cfg)
    worlds = tasks.make_worlds(cfg)
    rng = tasks.seed_key(cfg)
    init = None
    if resume:
        loaded = load_params(cfg.MODEL_NAME)
        init = (loaded["actor"], loaded["critic"])
    state = make_train_state(cfg, worlds, rng, lr=cfg.LEARNING_RATE,
                             init_params=init)
    if verbose:
        print(f"DDPG train: {num_frames:.0f} frames at lr="
              f"{cfg.LEARNING_RATE}", flush=True)
    best: dict = {}
    state = _train_frames(cfg, state, num_frames, cfg.LEARNING_RATE,
                          verbose, run=run,
                          eval_every_rounds=eval_every_rounds, best=best)
    stage1 = best.get("params") or (state.actor_params,
                                    state.critic_params)
    save_params(run.path, {"actor": stage1[0], "critic": stage1[1]})

    final = stage1
    if not resume:
        # lr drop + extended run (ddpg.py:98-102); seeded from the
        # best-of-stage-1 snapshot
        lr2 = cfg.LEARNING_RATE / 10.0
        cfg2 = cfg.replace(LOG_DIR=cfg.LOG_DIR + "_extended")
        run2 = setup_run_dir(cfg2, snapshot_src=False)
        state2 = make_train_state(cfg2, tasks.make_worlds(cfg2),
                                  jax.random.split(rng)[0], lr=lr2,
                                  init_params=stage1)
        if verbose:
            print(f"DDPG extended: {num_frames:.0f} frames at lr={lr2}",
                  flush=True)
        state2 = _train_frames(cfg2, state2, num_frames, lr2, verbose,
                               run=run2,
                               eval_every_rounds=eval_every_rounds,
                               best=best)
        final = best.get("params") or (state2.actor_params,
                                       state2.critic_params)
        save_params(run2.path, {"actor": final[0], "critic": final[1]})
        state = state2

    if verbose and best.get("score") is not None:
        print(f"  selected snapshot @ {best['frames']} frames "
              f"(crash={best['score'][1]:.4f} jerk={best['score'][2]:.3f})",
              flush=True)
    evaluate(cfg, params=final[0], record_csv=record_csv)
    return state


def _load_actor(cfg: Settings):
    from ..checkpoint import load_params
    return load_params(cfg.MODEL_NAME)["actor"]


def evaluate(cfg: Settings, params=None, verbose: bool = True,
             record_csv: bool = True):
    """EVALUATE_DDPG (reference main.py:32-34 -> dqn.py:202-213).

    ``record_csv=False`` (the CLI's --no-csv) keeps smoke/verify runs out
    of run_data.csv, the acceptance database (ADVICE r4)."""
    from .. import tasks
    if params is None:
        params = _load_actor(cfg)
    controller = jax.jit(actor_controller(params, cfg))
    agg = tasks.evaluate_controller(cfg, controller, verbose=verbose)
    if verbose:
        agg.print_stats()
    agg.save_plots(f"runs/{cfg.LOG_DIR}")
    try:
        from ..forensics import plot_rollouts
        plot_rollouts(actor_jerk(params, cfg), cfg,
                      f"runs/{cfg.LOG_DIR}/plots")
    except Exception:                     # pragma: no cover - plots only
        import logging
        logging.getLogger(__name__).warning(
            "rollout plots failed", exc_info=True)
    if record_csv:
        agg.add_csv_data()
    return agg


def evaluate_combined(cfg: Settings, params=None, verbose: bool = True,
                      record_csv: bool = True):
    """EVALUATE_COMBINED_* (reference main.py:35-40 -> dqn.py:228-241)."""
    from .. import tasks
    from .combined import combined_controller
    if params is None:
        params = _load_actor(cfg)
    policy = actor_jerk(params, cfg)
    controller, init_carry, takeover_stats = combined_controller(policy, cfg)
    carry = init_carry(cfg.BATCH_SCENARIOS) if init_carry else None
    agg = tasks.evaluate_controller(cfg, controller, verbose=verbose,
                                    custom_stats=takeover_stats,
                                    controller_carry=carry)
    if verbose:
        agg.print_stats()
    agg.save_plots(f"runs/{cfg.LOG_DIR}")
    if record_csv:
        agg.add_csv_data()
    return agg
