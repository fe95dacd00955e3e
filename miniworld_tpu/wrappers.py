"""Observation/action wrappers (reference: miniworld/wrappers.py:7-69).

Two families:
  * gymnasium wrappers for the single-env adapter — drop-in parity with
    the reference classes (same names, same math);
  * pure functions for the vectorized TPU path (apply under jit to the
    batched obs), since gymnasium wrappers can't wrap a jitted batch.
"""

from __future__ import annotations

import gymnasium as gym
import numpy as np
from gymnasium import spaces

# luma weights (wrappers.py:37-41)
_LUMA = (0.30, 0.59, 0.11)


class PyTorchObsWrapper(gym.ObservationWrapper):
    """HWC uint8 -> CWH transpose (wrappers.py:7-24)."""

    def __init__(self, env):
        super().__init__(env)
        obs_shape = self.observation_space.shape
        self.observation_space = spaces.Box(
            self.observation_space.low.flatten()[0],
            self.observation_space.high.flatten()[0],
            [obs_shape[2], obs_shape[1], obs_shape[0]],
            dtype=self.observation_space.dtype,
        )

    def observation(self, observation):
        return observation.transpose(2, 1, 0)


class GreyscaleWrapper(gym.ObservationWrapper):
    """RGB -> single-channel greyscale (wrappers.py:27-46)."""

    def __init__(self, env):
        super().__init__(env)
        obs_shape = self.observation_space.shape
        self.observation_space = spaces.Box(
            self.observation_space.low.flatten()[0],
            self.observation_space.high.flatten()[0],
            [obs_shape[0], obs_shape[1], 1],
            dtype=self.observation_space.dtype,
        )

    def observation(self, obs):
        obs = (
            _LUMA[0] * obs[:, :, 0]
            + _LUMA[1] * obs[:, :, 1]
            + _LUMA[2] * obs[:, :, 2]
        )
        return np.expand_dims(obs, axis=2).astype(self.observation_space.dtype)


class StochasticActionWrapper(gym.ActionWrapper):
    """epsilon-random action substitution (wrappers.py:49-69)."""

    def __init__(self, env=None, prob=0.9, random_steps=0):
        super().__init__(env)
        self.prob = prob
        self.random_steps = random_steps
        self.step_count = 0

    def action(self, action):
        if self.step_count < self.random_steps:
            self.step_count += 1
            return self.env.action_space.sample()
        if np.random.uniform() < self.prob:
            return action
        return self.env.action_space.sample()


# -- vectorized (device-side) counterparts -------------------------------


def pytorch_obs(obs):
    """(B,H,W,C) -> (B,C,W,H); same transpose as PyTorchObsWrapper."""
    return obs.transpose(0, 3, 2, 1)


def greyscale_obs(obs):
    """(B,H,W,3) u8 -> (B,H,W,1) u8 with the reference luma weights."""
    import jax.numpy as jnp

    f = obs.astype(jnp.float32)
    g = _LUMA[0] * f[..., 0] + _LUMA[1] * f[..., 1] + _LUMA[2] * f[..., 2]
    return g[..., None].astype(obs.dtype)


def stochastic_actions(key, actions, sample_fn, prob: float = 0.9):
    """With prob keep ``actions``, else substitute random ones."""
    import jax
    import jax.numpy as jnp

    k1, k2 = jax.random.split(key)
    keep = jax.random.uniform(k1, (actions.shape[0],)) < prob
    rand = sample_fn(k2)
    bshape = (actions.shape[0],) + (1,) * (actions.ndim - 1)
    return jnp.where(keep.reshape(bshape), actions, rand)
