"""Sharded train step: env rollout + A2C learner over a device mesh.

One jitted program per call: under ``shard_map`` each chip steps its
shard of the env batch (rollout with the current policy), computes
learner gradients locally, and joins a single ``pmean`` — the complete
"sharded envs feed a sharded learner over ICI collectives" deployment
shape from BASELINE.json's north star. This is also what the driver's
multi-chip dry-run executes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import PartitionSpec as P

from miniworld_tpu.parallel import learner as L
from miniworld_tpu.parallel.mesh import DATA_AXIS


def make_train_step(env, mesh, horizon: int = 4, lr: float = 3e-4):
    """Build ``train_step(bank, atlas, params, state, obs, depth, key)``.

    ``env`` is a MiniWorldVec whose ``num_envs`` is the GLOBAL batch;
    each chip runs ``num_envs / n_devices`` envs. Returns the jitted
    step and an ``init(key)`` helper producing sharded initial state.
    """
    n_dev = mesh.devices.size
    assert env.num_envs % n_dev == 0, (env.num_envs, n_dev)
    num_actions = (
        env._action_table.shape[0] if env._action_table is not None else 6
    )

    def policy_factory(params):
        def policy(obs, depth, key):
            rgb = jax.tree.leaves(obs)[0]
            logits, _ = L.forward(params, rgb, depth)
            return jax.random.categorical(key, logits)
        return policy

    def local_train(bank, atlas, params, state, obs, depth, key):
        key = jax.random.fold_in(key, jax.lax.axis_index(DATA_AXIS))
        k_roll, k_act = jax.random.split(key)
        rollout = env.rollout_fn(horizon, policy=policy_factory(params),
                                 return_obs=True)
        state, obs, depth, outs = rollout(bank, atlas, state, obs, depth, k_roll)

        # flatten (T, B, ...) -> (T*B, ...) transitions; returns are the
        # per-step rewards (1-step return baseline; enough to exercise
        # the full bwd pass + collective)
        rgb_t = jax.tree.leaves(outs["obs"])[0]
        T, B = rgb_t.shape[0], rgb_t.shape[1]
        rgb = rgb_t.reshape(T * B, *rgb_t.shape[2:])
        dep = outs["depth"].reshape(T * B, *outs["depth"].shape[2:]) \
            if "depth" in outs else jnp.zeros(rgb.shape[:3] + (1,), jnp.float32)
        actions = jax.random.randint(k_act, (T * B,), 0, num_actions)
        returns = jnp.broadcast_to(
            (outs["reward"] / B)[:, None], (T, B)
        ).reshape(T * B)

        params, loss = L.grad_step(params, rgb, dep, actions, returns,
                                   lr=lr, axis_name=DATA_AXIS)
        metrics = {
            "loss": loss,
            "reward": jax.lax.psum(outs["reward"].sum(), DATA_AXIS),
            "dones": jax.lax.psum(outs["dones"].sum(), DATA_AXIS),
        }
        return params, state, obs, depth, metrics

    pspec_env = P(DATA_AXIS)
    pspec_rep = P()
    train = shard_map(
        local_train, mesh=mesh,
        in_specs=(pspec_rep, pspec_rep, pspec_rep, pspec_env, pspec_env,
                  pspec_env, pspec_rep),
        out_specs=(pspec_rep, pspec_env, pspec_env, pspec_env, pspec_rep),
        check_rep=False,
    )
    train_jit = jax.jit(train)

    def init(key):
        k_env, k_par = jax.random.split(key)
        keys = jax.random.split(k_env, env.num_envs)
        state = env._reset_jit(env._bank, keys)
        obs, depth = env._render_jit(env._bank, env._atlas, state)
        params = L.init_params(
            k_par, (env.obs_height, env.obs_width, 3), num_actions
        )
        return params, state, obs, depth

    def step(params, state, obs, depth, key):
        return train_jit(env._bank, env._atlas, params, state, obs, depth, key)

    return step, init
