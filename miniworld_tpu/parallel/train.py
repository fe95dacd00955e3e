"""Sharded train step: env rollout + A2C learner over a device mesh.

One jitted program per call: under ``shard_map`` each chip steps its
shard of the env batch (rollout with the current policy), computes
learner gradients locally, and joins a single ``pmean`` — the complete
"sharded envs feed a sharded learner over ICI collectives" deployment
shape from BASELINE.json's north star. This is also what the driver's
multi-chip dry-run executes.

The gradient is computed on the transitions the policy itself produced:
``rollout_fn(return_obs=True, return_actions=True)`` records the
acted-on observations, the sampled actions, per-env rewards and done
flags; returns are n-step discounted sums bootstrapped from the critic
at the post-rollout observation, cut at auto-reset boundaries.

Note: the round-1 commit 2816e30 claimed this wiring but only added the
``return_actions`` option to vector.py — the trainer still fed randomly
sampled actions into the loss. This module is the actual fix; the
learning curve is recorded in PERF.md.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import PartitionSpec as P

from miniworld_tpu.parallel import learner as L
from miniworld_tpu.parallel.mesh import DATA_AXIS


def discounted_returns(rewards, dones, bootstrap, gamma: float):
    """(T, B) rewards/dones + (B,) bootstrap -> (T, B) n-step returns.

    ``R_t = r_t + gamma * (1 - done_t) * R_{t+1}`` with
    ``R_T = V(obs_T)``; done cuts the tail because auto-reset makes
    ``obs_{t+1}`` the first observation of a NEW episode.
    """

    def back(ret_next, x):
        r, d = x
        ret = r + gamma * jnp.where(d, 0.0, ret_next)
        return ret, ret

    _, returns = jax.lax.scan(back, bootstrap, (rewards, dones), reverse=True)
    return returns


def make_train_step(env, mesh, horizon: int = 4, lr: float = 3e-4,
                    gamma: float = 0.99):
    """Build ``train_step(bank, atlas, tstate, state, obs, depth, key)``.

    ``env`` is a MiniWorldVec whose ``num_envs`` is the GLOBAL batch;
    each chip runs ``num_envs / n_devices`` envs. Returns the jitted
    step and an ``init(key)`` helper producing the train state
    ``{"params", "opt"}`` and sharded env state.
    """
    n_dev = mesh.devices.size
    assert env.num_envs % n_dev == 0, (env.num_envs, n_dev)
    if env._action_table is not None:
        num_actions = env._action_table.shape[0]
    elif getattr(env.spec, "num_actions", 0):
        num_actions = env.spec.num_actions
    else:
        raise ValueError(
            f"{env.spec.name}: make_train_step needs a discrete action "
            "space (a discrete_actions table or spec.num_actions); the "
            "categorical policy head cannot drive continuous Box(6) "
            "actions — add a Gaussian head or set_discrete_actions."
        )

    def policy_factory(params):
        def policy(obs, depth, key):
            rgb = jax.tree.leaves(obs)[0]
            logits, _ = L.forward(params, rgb, depth)
            return jax.random.categorical(key, logits)
        return policy

    def local_train(bank, atlas, tstate, state, obs, depth, key):
        key = jax.random.fold_in(key, jax.lax.axis_index(DATA_AXIS))
        params = tstate["params"]
        rollout = env.rollout_fn(horizon, policy=policy_factory(params),
                                 return_obs=True, return_actions=True)
        state, obs, depth, outs = rollout(bank, atlas, state, obs, depth, key)

        # transitions the policy actually produced: obs[t] -> actions[t]
        rgb_t = jax.tree.leaves(outs["obs"])[0]  # (T, B, H, W, 3)
        T, B = rgb_t.shape[0], rgb_t.shape[1]
        dep_t = outs.get(
            "depth", jnp.zeros(rgb_t.shape[:4] + (1,), jnp.float32)
        )
        # bootstrap the tail from the critic at the post-rollout obs
        _, v_boot = L.forward(params, jax.tree.leaves(obs)[0], depth)
        returns = discounted_returns(
            outs["rewards"], outs["done_mask"],
            jax.lax.stop_gradient(v_boot), gamma,
        )

        params, opt, loss = L.grad_step(
            params, tstate["opt"],
            rgb_t.reshape(T * B, *rgb_t.shape[2:]),
            dep_t.reshape(T * B, *dep_t.shape[2:]),
            outs["actions"].reshape(T * B).astype(jnp.int32),
            returns.reshape(T * B),
            lr=lr, axis_name=DATA_AXIS,
        )
        metrics = {
            "loss": loss,
            "reward": jax.lax.psum(outs["reward"].sum(), DATA_AXIS),
            "dones": jax.lax.psum(outs["dones"].sum(), DATA_AXIS),
            "return_mean": jax.lax.pmean(returns.mean(), DATA_AXIS),
        }
        return {"params": params, "opt": opt}, state, obs, depth, metrics

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
        tstate = {"params": params, "opt": L.adam_init(params)}
        return tstate, state, obs, depth

    def step(tstate, state, obs, depth, key):
        return train_jit(env._bank, env._atlas, tstate, state, obs, depth, key)

    return step, init
