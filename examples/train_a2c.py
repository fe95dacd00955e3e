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
    print(f"devices: {n_dev}, envs: {num_envs}")

    env = MiniWorldVec(args.env, num_envs=num_envs, obs_width=obs_w,
                       obs_height=obs_h)
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
    for it in range(args.iters):
        key, k = jax.random.split(key)
        tstate, state, obs, depth, metrics = step(tstate, state, obs, depth, k)
        steps_done += args.horizon * num_envs
        loss = float(metrics["loss"])
        rew = float(metrics["reward"])
        dones = int(metrics["dones"])
        now = time.perf_counter()
        row = {
            "iter": it,
            "loss": loss,
            "reward": rew,
            "reward_per_step": rew / (args.horizon * num_envs),
            "return_mean": float(metrics["return_mean"]),
            "episodes": dones,
            "resets_per_s": dones / max(now - last_t, 1e-9),
            "env_steps": steps_done,
            "env_steps_per_s": (steps_done - last_steps) / max(now - last_t, 1e-9),
            "env_steps_per_s_per_chip": (steps_done - last_steps)
            / max(now - last_t, 1e-9) / n_dev,
        }
        last_t, last_steps = now, steps_done
        if metrics_f:
            metrics_f.write(json.dumps(row) + "\n")
            metrics_f.flush()
        if it % 10 == 0 or it == args.iters - 1:
            sps = steps_done / (now - t0)
            print(f"iter {it:4d}  loss {loss:8.4f}  reward/iter {rew:8.1f}  "
                  f"episodes {dones:5d}  {sps:,.0f} env-steps/s")
        if args.checkpoint and it and it % 50 == 0:
            from miniworld_tpu.utils import checkpoint

            checkpoint.save(f"{args.checkpoint}/it{it:06d}",
                            {"train_state": tstate, "env_state": state})
            print(f"checkpointed at iter {it}")
    if metrics_f:
        metrics_f.close()


if __name__ == "__main__":
    main()
