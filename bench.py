"""Benchmark: env-steps/s/chip, vectorized, RGB-D observations.

Metric of record (BASELINE.json): env-steps/s/chip with RGB-D obs.
Runs the fused on-device rollout (lax.scan over step+render) on the
default JAX backend and prints ONE JSON line:

    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

``vs_baseline`` is the fraction of the BASELINE.json north-star target
(1e6 env-steps/s per host) — the reference itself publishes no
throughput numbers (/root/reference/README.md:31-41 is qualitative
only, scripts/benchmark.py prints without recording).

Usage: python bench.py [env_id] [num_envs] [horizon] [--procgen|--bank]

The Maze family DEFAULTS to device-side per-reset maze generation
(reference reset semantics; envs/nav.py Maze.procgen_default).
``--procgen`` forces that mode on, ``--bank`` forces the compiled
layout-bank fast path; without either the spec's default applies.
"""

from __future__ import annotations

import json
import sys
import time

import jax

TARGET = 1_000_000.0  # north-star env-steps/s per host (BASELINE.json)


def main():
    args = [a for a in sys.argv[1:] if a not in ("--procgen", "--bank")]
    procgen = True if "--procgen" in sys.argv[1:] else (
        False if "--bank" in sys.argv[1:] else None
    )
    env_id = args[0] if len(args) > 0 else "MiniWorld-Hallway-v0"
    num_envs = int(args[1]) if len(args) > 1 else 1024
    horizon = int(args[2]) if len(args) > 2 else 50

    from miniworld_tpu import MiniWorldVec

    env = MiniWorldVec(env_id, num_envs=num_envs, obs_width=80, obs_height=60,
                       with_depth=True, procgen=procgen)
    state, obs = env.reset(jax.random.key(0))

    # compile + warmup. Timing fence: an actual device->host FETCH of
    # the obs checksum, not block_until_ready — through the axon
    # tunnel block_until_ready returned early on some programs
    # (PutNext measured "154M steps/s"; a transfer cannot lie).
    state, obs, outs = env.rollout(state, obs, jax.random.key(1), horizon)
    float(jax.device_get(outs["obs_sum"]).sum())

    best = 0.0
    checksums = []
    for trial in range(3):
        t0 = time.perf_counter()
        state, obs, outs = env.rollout(
            state, obs, jax.random.key(2 + trial), horizon
        )
        checksums.append(float(jax.device_get(outs["obs_sum"]).sum()))
        dt = time.perf_counter() - t0
        best = max(best, horizon * num_envs / dt)
    # sanity: varying inputs must produce varying renders (guards
    # against any result-caching or constant-folding shortcut)
    assert len(set(checksums)) > 1, checksums

    print(json.dumps({
        "metric": f"env-steps/s/chip ({env_id}, B={num_envs}, 80x60 RGB-D, "
                  + ("procgen, " if env.procgen else "") + "fused rollout)",
        "value": round(best),
        "unit": "env-steps/s",
        "vs_baseline": round(best / TARGET, 4),
    }))


if __name__ == "__main__":
    main()
