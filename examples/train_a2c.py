#!/usr/bin/env python3
"""End-to-end RL training on the TPU engine.

Replaces the reference's stale torch demos (reference experiments/
directory: an autoencoder and a random-search RNN agent on the old gym
API) with the deployment shape this framework is built for: thousands
of vectorized envs stepping on device, feeding an actor-critic learner
whose gradients are psum-averaged across every chip in the mesh.

    python examples/train_a2c.py --env MiniWorld-OneRoomS6Fast-v0 \
        --num-envs 512 --iters 200

On a multi-chip/multi-host platform the same script scales by the
device count (the env batch is sharded over the full mesh).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


import argparse
import json
import time

import jax


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--env", default="MiniWorld-OneRoomS6Fast-v0")
    p.add_argument("--num-envs", type=int, default=512)
    p.add_argument("--horizon", type=int, default=16)
    p.add_argument("--iters", type=int, default=100)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--obs", default="64x48")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--gamma", type=float, default=0.99)
    p.add_argument("--checkpoint", default=None,
                   help="orbax path to save params+env state each 50 iters")
    p.add_argument("--metrics", default=None,
                   help="path for per-iteration JSONL metrics")
    p.add_argument("--log-every", type=int, default=50,
                   help="iterations between metric fetches (each fetch "
                        "syncs the device pipeline; keep sparse on "
                        "high-latency tunnels)")
    p.add_argument("--refresh-layouts-every", type=int, default=0,
                   help="swap in a freshly generated layout bank every "
                        "N iterations (procedural envs: the training "
                        "distribution becomes unbounded like the "
                        "reference's per-reset generation). Banks are "
                        "prepared in a background thread and the swap "
                        "is recompile-free (shape-stable).")
    p.add_argument("--procgen", action="store_true",
                   help="maze-grid envs: generate a fresh maze ON "
                        "DEVICE at every reset (reference reset "
                        "semantics, miniworld/envs/maze.py:100-149) "
                        "instead of cycling a compiled layout bank; "
                        "--refresh-layouts-every is then unnecessary")
    args = p.parse_args()
    obs_w, obs_h = map(int, args.obs.split("x"))

    from miniworld_tpu import MiniWorldVec
    from miniworld_tpu.parallel import (
        init_multihost, make_mesh, make_train_step, shard_env_batch,
    )

    init_multihost()
    mesh = make_mesh()
    n_dev = mesh.devices.size
    num_envs = (args.num_envs // n_dev) * n_dev
    print(f"devices: {n_dev} x {mesh.devices.flat[0].platform}, envs: {num_envs}")

    env = MiniWorldVec(args.env, num_envs=num_envs, obs_width=obs_w,
                       obs_height=obs_h, procgen=args.procgen)
    step, init = make_train_step(env, mesh, horizon=args.horizon, lr=args.lr,
                                 gamma=args.gamma)
    tstate, state, obs, depth = init(jax.random.key(args.seed))
    state = shard_env_batch(mesh, state)
    obs = shard_env_batch(mesh, obs)
    depth = shard_env_batch(mesh, depth)

    metrics_f = open(args.metrics, "w") if args.metrics else None
    key = jax.random.key(args.seed + 1)
    t0 = time.perf_counter()
    steps_done = 0
    last_t, last_steps = t0, 0
    pending = []  # (iter, metrics pytree) — fetched in batches: a
    # per-iteration float() sync drains the async dispatch pipeline
    # (one tunnel round-trip per iter, ~40x slower end-to-end)

    def drain(now):
        nonlocal last_t, last_steps
        if not pending:
            return
        span = max(now - last_t, 1e-9)
        span_steps = steps_done - last_steps
        # ONE host transfer for the whole window (each individual
        # float() is a separate device round-trip)
        pending[:] = [
            (it_, m) for (it_, _), m in zip(
                pending, jax.device_get([m for _, m in pending])
            )
        ]
        for it_, m in pending:
            row = {
                "iter": it_,
                "loss": float(m["loss"]),
                "reward": float(m["reward"]),
                "reward_per_step": float(m["reward"]) / (args.horizon * num_envs),
                "return_mean": float(m["return_mean"]),
                "episodes": int(m["dones"]),
                "env_steps": (it_ + 1) * args.horizon * num_envs,
                "env_steps_per_s": span_steps / span,
                "env_steps_per_s_per_chip": span_steps / span / n_dev,
                "resets_per_s": int(m["dones"]) * len(pending) / span,
            }
            if metrics_f:
                metrics_f.write(json.dumps(row) + "\n")
        if metrics_f:
            metrics_f.flush()
        it_, m = pending[-1]
        # WINDOW rate, not cumulative: the first window carries the
        # jit compile (~1-2 min through the axon tunnel), which made
        # the cumulative average meaningless for hours of wall clock
        sps = span_steps / span
        print(f"iter {it_:4d}  loss {float(m['loss']):8.4f}  "
              f"reward/iter {float(m['reward']):8.1f}  "
              f"episodes {int(m['dones']):5d}  {sps:,.0f} env-steps/s")
        pending.clear()
        last_t, last_steps = now, steps_done

    refresh_fut = None
    pool = None
    if args.refresh_layouts_every:
        from concurrent.futures import ThreadPoolExecutor

        pool = ThreadPoolExecutor(1)
        refresh_fut = pool.submit(env.prepare_bank, args.seed + 1000)

    for it in range(args.iters):
        key, k = jax.random.split(key)
        tstate, state, obs, depth, metrics = step(tstate, state, obs, depth, k)
        steps_done += args.horizon * num_envs
        pending.append((it, metrics))
        if (args.refresh_layouts_every
                and it % args.refresh_layouts_every
                == args.refresh_layouts_every - 1):
            # the bank was compiled off-thread; the swap is just new
            # jit arguments (env auto-resets migrate episodes onto the
            # new layouts as they end)
            env.install_bank(refresh_fut.result())
            refresh_fut = pool.submit(env.prepare_bank,
                                      args.seed + 1000 + it + 1)
        if it % args.log_every == args.log_every - 1 or it == args.iters - 1:
            drain(time.perf_counter())
        if args.checkpoint and it and it % 50 == 0:
            from miniworld_tpu.utils import checkpoint

            checkpoint.save(f"{args.checkpoint}/it{it:06d}",
                            {"train_state": tstate, "env_state": state})
            print(f"checkpointed at iter {it}")
    if pool:
        pool.shutdown(wait=False, cancel_futures=True)
    if metrics_f:
        metrics_f.close()


if __name__ == "__main__":
    main()
