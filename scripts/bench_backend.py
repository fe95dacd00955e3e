#!/usr/bin/env python3
"""A/B the XLA raycaster against the fused Pallas kernel on real envs.

Runs the fused rollout (step + render per env-step, the bench.py
workload) for both backends over the same seeds and prints one JSON
line per (env, backend) with env-steps/s, plus a pixel-agreement check
on one frame so a fast-but-wrong kernel can't win silently.

    python scripts/bench_backend.py [env_id ...] [--num-envs N]
        [--horizon H] [--trials T]

Inputs vary per trial (the axon backend caches (executable, args)
pairs — CLAUDE.md).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import numpy as np

DEFAULT_ENVS = [
    "MiniWorld-Hallway-v0",
    "MiniWorld-FourRooms-v0",
    "MiniWorld-Maze-v0",
    "MiniWorld-PickupObjects-v0",
]


def bench_env(env_id: str, backend: str, num_envs: int, horizon: int,
              trials: int, tri_chunk: int | None = None,
              skips: bool = True):
    from miniworld_tpu import MiniWorldVec

    kw = {} if tri_chunk is None else {"tri_chunk": tri_chunk}
    env = MiniWorldVec(env_id, num_envs=num_envs, obs_width=80,
                       obs_height=60, render_backend=backend, **kw)
    if backend == "pallas" and not skips:
        env._pallas_tile_skip = False
        env._pallas_occlusion_skip = False
    state, obs = env.reset(jax.random.key(0))
    state, obs, outs = env.rollout(state, obs, jax.random.key(1), horizon)
    jax.block_until_ready(outs["obs_sum"])

    best = 0.0
    for t in range(trials):
        t0 = time.perf_counter()
        state, obs, outs = env.rollout(
            state, obs, jax.random.key(2 + t), horizon
        )
        jax.block_until_ready(outs["obs_sum"])
        dt = time.perf_counter() - t0
        best = max(best, horizon * num_envs / dt)
    return env, best


def frame_agreement(env_x, env_p):
    """Fraction of differing pixels on a shared replayed frame."""
    sx, ox = env_x.reset(jax.random.key(7))
    sp, op = env_p.reset(jax.random.key(7))
    for i in range(5):
        acts = env_x.sample_actions(jax.random.key(100 + i))
        sx, ox, *_ = env_x.step(sx, acts)
        sp, op, *_ = env_p.step(sp, acts)
    rx = jax.tree.leaves(ox[0] if isinstance(ox, tuple) else ox)[0]
    rp = jax.tree.leaves(op[0] if isinstance(op, tuple) else op)[0]
    diff = np.abs(np.asarray(rx, np.int32) - np.asarray(rp, np.int32))
    return float((diff > 2).mean())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("envs", nargs="*", default=None)
    ap.add_argument("--num-envs", type=int, default=1024)
    ap.add_argument("--horizon", type=int, default=50)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--sweep-tri-chunk", type=int, nargs="*",
                    default=None, metavar="K",
                    help="pallas-only: re-bench one env per chunk size "
                         "(finer chunks = finer culling; the XLA "
                         "planner's optimum need not be the kernel's)")
    ap.add_argument("--no-skips", action="store_true",
                    help="pallas-only: disable tile/occlusion skipping "
                         "to isolate its contribution")
    args = ap.parse_args()
    env_ids = args.envs or DEFAULT_ENVS

    if args.sweep_tri_chunk:
        for env_id in env_ids:
            for k in args.sweep_tri_chunk:
                row = {"env": env_id, "B": args.num_envs, "tri_chunk": k,
                       "skips": not args.no_skips}
                try:
                    _, sps = bench_env(env_id, "pallas", args.num_envs,
                                       args.horizon, args.trials,
                                       tri_chunk=k,
                                       skips=not args.no_skips)
                    row["pallas_steps_s"] = round(sps)
                except Exception as e:  # noqa: BLE001
                    row["pallas_error"] = repr(e)[:200]
                print(json.dumps(row), flush=True)
        return

    for env_id in env_ids:
        row = {"env": env_id, "B": args.num_envs}
        try:
            env_x, sps_x = bench_env(env_id, "xla", args.num_envs,
                                     args.horizon, args.trials)
            row["xla_steps_s"] = round(sps_x)
        except Exception as e:  # noqa: BLE001
            row["xla_error"] = repr(e)[:200]
            env_x = None
        try:
            env_p, sps_p = bench_env(env_id, "pallas", args.num_envs,
                                     args.horizon, args.trials)
            row["pallas_steps_s"] = round(sps_p)
        except Exception as e:  # noqa: BLE001
            row["pallas_error"] = repr(e)[:200]
            env_p = None
        if env_p is not None:
            # schedule-skip effectiveness: average chunks the kernel
            # actually runs per env vs the static schedule length
            # (repeats are skipped in-kernel; vector._pallas_schedules)
            sp, _ = env_p.reset(jax.random.key(11))
            sched = np.asarray(env_p._pallas_schedules(env_p._bank, sp))
            active = 1 + (sched[:, 1:] != sched[:, :-1]).sum(axis=1)
            row["sched_len"] = int(sched.shape[1])
            row["sched_active_mean"] = round(float(active.mean()), 2)
        if env_x is not None and env_p is not None:
            row["pixel_diff_frac"] = round(frame_agreement(env_x, env_p), 5)
            row["speedup"] = round(sps_p / max(sps_x, 1e-9), 3)
        print(json.dumps(row), flush=True)
        del env_x, env_p


if __name__ == "__main__":
    main()
