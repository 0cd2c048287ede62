"""Probe the TPU batch-1024 eval crash anomaly.

Observed (round 4): EVALUATE_DDPG of ddpg_fast1_extended reports ~0.1%
crash at batch 128 on TPU, ~0.2% at batch 1024 on CPU (same seeds), but
4.5% at batch 1024 on TPU (round 1 of 4: 10%).  The reference's row is
0.00025.  Same code path (auto_mesh is None on one device) — so the
suspicion is a TPU-compiled-program numeric/correctness issue that only
manifests at large batch.

This probe, on TPU:
  1. re-runs batch-1024 round 1 and prints per-scenario crash indices
     (reproducibility check vs the recorded run);
  2. runs the SAME worlds at batch 512 + 256 (same key-split prefix? no —
     split(n) differs per n, so also run the 1024-world split sliced to
     the first 512 via explicit init) to separate "which worlds" from
     "which batch size";
  3. captures crash state histories (save_state_on_crash) and replays
     each crash through the float64 planner-side crash predicate offline.

Usage: python scripts/probe_batch1024.py [--family fast] [--seed 1]
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", default="fast")
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from rl_mpc_lanemerging_tpu import tasks
    from rl_mpc_lanemerging_tpu.agents.ddpg import actor_controller
    from rl_mpc_lanemerging_tpu.checkpoint import load_params
    from rl_mpc_lanemerging_tpu.config import Settings
    from rl_mpc_lanemerging_tpu.sim.episode import run_episode_batch

    cfg0 = Settings.load_from_file(
        f"configs/train_{args.family}_{args.seed}.json")
    params = load_params(
        f"runs/ddpg_{args.family}{args.seed}_extended")["actor"]

    def fresh_round(batch, n_worlds=None, rounds=1):
        n_worlds = n_worlds or batch
        cfg = cfg0.replace(BATCH_SCENARIOS=batch)
        controller = jax.jit(actor_controller(params, cfg))
        worlds = tasks.make_worlds(cfg, n_worlds, jnp.float32)
        if n_worlds != batch:
            worlds = jax.tree.map(lambda x: x[:batch], worlds)
        out = []
        for r in range(rounds):
            worlds, stats = run_episode_batch(worlds, cfg, controller)
            c = np.asarray(stats.crashed).astype(bool)
            out.append(np.nonzero(c)[0])
            print(f"  batch={batch} worlds={n_worlds} round={r} "
                  f"crashes={int(c.sum())}/{batch} "
                  f"idx[:16]={np.nonzero(c)[0][:16].tolist()}", flush=True)
        return out

    print("== same batch sizes, native key splits ==", flush=True)
    idx1024 = fresh_round(1024, rounds=2)
    fresh_round(128, rounds=2)
    fresh_round(512, rounds=1)
    print("== first 512 of the 1024-split worlds at batch 512 ==",
          flush=True)
    fresh_round(512, n_worlds=1024, rounds=1)
    print("== first 128 of the 1024-split worlds at batch 128 ==",
          flush=True)
    fresh_round(128, n_worlds=1024, rounds=1)

    # determinism check: run the 1024 round again
    print("== repeat 1024 round 1 (determinism) ==", flush=True)
    idx1024b = fresh_round(1024, rounds=1)
    same = np.array_equal(idx1024[0], idx1024b[0])
    print(f"deterministic: {same}", flush=True)

    # TPU default matmul precision control: if the f32-forced round drops
    # to the CPU-level crash rate, the actor's bf16 matmuls are the cause
    print("== 1024 round 1 under float32 matmul precision ==", flush=True)
    with jax.default_matmul_precision("float32"):
        fresh_round(1024, rounds=1)


if __name__ == "__main__":
    main()
