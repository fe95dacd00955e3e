"""Rollout-only sharding: experience generation over a device mesh
with no learner attached.

The deployment shape for dataset generation / evaluation / actor-side
of a disaggregated learner: env state lives sharded over the ``data``
mesh axis, every device steps and renders its own shard, and — because
envs are independent — the compiled program must contain ZERO
cross-device collectives (checked by ``compiled_has_collectives``; the
weak-scaling test in tests/test_multichip.py asserts it per mesh
size). Collectives belong to the learner (parallel/train.py gradient
psum) only.
"""

from __future__ import annotations

from types import SimpleNamespace

import jax
from jax import shard_map
from jax.sharding import PartitionSpec as P

from miniworld_tpu.parallel.mesh import DATA_AXIS, shard_env_batch

_COLLECTIVE_OPS = (
    "all-reduce", "all-gather", "all-to-all", "collective-permute",
    "reduce-scatter", "collective-broadcast",
)


def make_sharded_rollout(env, mesh, horizon: int, *, policy=None):
    """Build a sharded fused rollout over ``mesh``'s data axis.

    Returns a namespace with:
      init(key) -> (state, obs, depth)     sharded reset
      step(state, obs, depth, key) -> (state, obs, depth, outs)
        outs leaves are per-step metrics, stacked per shard along
        axis 0: shape (n_shards * horizon,), reshapeable to
        (n_shards, horizon)
      compiled_has_collectives(*args) -> bool   HLO inspection hook

    (Learners that need stacked per-env observations/actions shard
    through make_train_step/make_ppo_step instead — their rollouts run
    inside the sharded train step.)
    """
    base = env.rollout_fn(horizon, policy=policy)

    def shard_fn(bank, atlas, state, obs, depth, key):
        # distinct randomness per shard: fold the mesh position in
        key = jax.random.fold_in(key, jax.lax.axis_index(DATA_AXIS))
        return base(bank, atlas, state, obs, depth, key)

    sharded = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS), P()),
        out_specs=(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)),
        check_vma=False,
    )
    fn = jax.jit(sharded)

    def init(key):
        keys = jax.random.split(key, env.num_envs)
        state = env._reset_jit(env._bank, keys)
        obs, depth = env._render_jit(env._bank, env._atlas, state)
        state = shard_env_batch(mesh, state)
        obs = shard_env_batch(mesh, obs)
        depth = shard_env_batch(mesh, depth)
        return state, obs, depth

    def step(state, obs, depth, key):
        return fn(env._bank, env._atlas, state, obs, depth, key)

    def compiled_has_collectives(state, obs, depth, key) -> bool:
        txt = fn.lower(
            env._bank, env._atlas, state, obs, depth, key
        ).compile().as_text()
        return any(op in txt for op in _COLLECTIVE_OPS)

    return SimpleNamespace(
        init=init, step=step, fn=fn,
        compiled_has_collectives=compiled_has_collectives,
    )
