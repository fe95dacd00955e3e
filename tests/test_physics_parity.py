"""Cross-implementation physics parity: the float64 host adapter (a
line-for-line transcription of the reference step,
miniworld/miniworld.py:677-813) is the golden model; the f32 vectorized
device path must track it within float tolerance on identical
scenarios. This realizes the BASELINE.md correctness target without
needing the reference's GL stack installed."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from miniworld_tpu import MiniWorldVec
from miniworld_tpu.gym_env import MiniWorldGym

W, H = 24, 18


@pytest.fixture(scope="module")
def pair():
    gym_env = MiniWorldGym("Hallway", obs_width=W, obs_height=H)
    vec_env = MiniWorldVec("MiniWorld-Hallway-v0", num_envs=1, obs_width=W,
                           obs_height=H)
    return gym_env, vec_env


def _sync(gym_env, vec_env, key):
    """Reset both and copy the host's world state into the device env."""
    gym_env.reset(seed=int(jax.random.randint(key, (), 0, 2**31 - 1)))
    state, _ = vec_env.reset(jax.random.key(0))
    ent_pos = np.asarray(state.ent_pos).copy()
    ent_dir = np.asarray(state.ent_dir).copy()
    ent_radius = np.asarray(state.ent_radius).copy()
    ent_height = np.asarray(state.ent_height).copy()
    for i, e in enumerate(gym_env.entities):
        ent_pos[0, i] = e.pos
        ent_dir[0, i] = e.dir
        ent_radius[0, i] = e.radius
        ent_height[0, i] = e.height
    state = state.replace(
        pos=jnp.asarray(gym_env.agent_pos, jnp.float32)[None],
        dir=jnp.asarray([gym_env.agent_dir], jnp.float32),
        cam_pitch=jnp.asarray([gym_env.cam_pitch], jnp.float32),
        ent_pos=jnp.asarray(ent_pos),
        ent_dir=jnp.asarray(ent_dir),
        ent_radius=jnp.asarray(ent_radius),
        ent_height=jnp.asarray(ent_height),
    )
    return state


ACTION_SCRIPT = [2, 2, 0, 2, 1, 1, 2, 2, 3, 4, 5, 2, 2, 2, 0, 2, 2, 2, 2, 2,
                 1, 2, 2, 2, 2]


def test_trajectory_parity(pair):
    """Same scripted actions -> same trajectory (f32 tolerance) and
    identical rewards/terminations."""
    gym_env, vec_env = pair
    state = _sync(gym_env, vec_env, jax.random.key(1))
    for t, a in enumerate(ACTION_SCRIPT):
        obs, r_h, term_h, trunc_h, info_h = gym_env.step(a)
        state, _, r_d, d_d, info_d = vec_env.step(
            state, jnp.asarray([a], jnp.int32)
        )
        if bool(d_d[0]):
            assert term_h or trunc_h
            break
        pos_d = np.asarray(info_d["agent_pos"][0])
        np.testing.assert_allclose(
            pos_d, gym_env.agent_pos, atol=2e-4,
            err_msg=f"step {t} action {a}",
        )
        np.testing.assert_allclose(
            float(info_d["agent_dir"][0]) % (2 * math.pi),
            gym_env.agent_dir % (2 * math.pi), atol=2e-4,
        )
        assert abs(float(r_d[0]) - r_h) < 1e-3
        assert bool(info_d["termination"][0]) == term_h


def test_collision_blocks_identically(pair):
    """Drive into the +x wall; both paths stop at the same pos."""
    gym_env, vec_env = pair
    state = _sync(gym_env, vec_env, jax.random.key(2))
    # face +x exactly
    gym_env.agent_dir = 0.0
    state = state.replace(dir=jnp.asarray([0.0], jnp.float32))
    for _ in range(90):
        gym_env.step(2)
        state, _, _, d, info = vec_env.step(state, jnp.asarray([2], jnp.int32))
        if bool(d[0]):
            break
    np.testing.assert_allclose(
        np.asarray(info["agent_pos"][0]), gym_env.agent_pos, atol=5e-4
    )


def test_pitch_clamp(pair):
    gym_env, vec_env = pair
    state = _sync(gym_env, vec_env, jax.random.key(3))
    up = np.array([0, 0, 0, 1, 0, 0], np.float32)
    for _ in range(10):
        gym_env.step(up)
        state, _, _, _, info = vec_env.step(state, jnp.asarray(up)[None])
    assert gym_env.cam_pitch == 89.0
    assert float(info["cam_pitch"][0]) == 89.0


def test_near_threshold_formula():
    """near() <=> dist < r0 + r1 + 1.1 * max_forward_step
    (miniworld.py:1048-1058)."""
    gym_env = MiniWorldGym("Hallway", obs_width=W, obs_height=H)
    gym_env.reset(seed=0)
    box = gym_env.entities[0]
    thresh = box.radius + gym_env.agent_radius + 1.1 * gym_env.max_forward_step
    gym_env.agent_pos = box.pos + np.array([thresh - 1e-6, 0, 0])
    assert gym_env.near(box)
    gym_env.agent_pos = box.pos + np.array([thresh + 1e-6, 0, 0])
    assert not gym_env.near(box)


def test_carry_pos_formula():
    """_get_carry_pos (miniworld.py:677-689)."""
    gym_env = MiniWorldGym("Hallway", obs_width=W, obs_height=H)
    gym_env.reset(seed=0)
    box = gym_env.entities[0]
    gym_env.agent_dir = 0.3
    p = gym_env._get_carry_pos(gym_env.agent_pos, box)
    dist = gym_env.agent_radius + box.radius + gym_env.max_forward_step
    expect = gym_env.agent_pos + gym_env.dir_vec * 1.05 * dist
    expect = expect + np.array([0, 1, 0]) * max(
        gym_env.cam_height - box.height - 0.3, 0
    )
    np.testing.assert_allclose(p, expect, atol=1e-12)
