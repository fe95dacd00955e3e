"""Per-env task semantics against hand-checked reference behavior."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from miniworld_tpu import MiniWorldVec
from miniworld_tpu.gym_env import MiniWorldGym

W, H = 24, 18


def test_tmaze_left_goal_pos():
    """TMazeLeft pins the goal near (10, 0, -6): the reference samples
    inside the degenerate bbox expanded by the entity radius
    (tmaze.py:63-70 + place_entity bbox expansion)."""
    env = MiniWorldGym("TMazeLeft", obs_width=W, obs_height=H)
    obs, info = env.reset(seed=0)
    box = env.entities[0]
    assert abs(box.pos[0] - 10) <= box.radius + 1e-6
    assert abs(box.pos[2] - (-6)) <= box.radius + 1e-6
    _, _, _, _, info = env.step(0)
    np.testing.assert_allclose(info["goal_pos"], box.pos)


def test_sidewalk_street_kills_episode():
    """Stepping into the street terminates with no reward
    (sidewalk.py:98-101)."""
    env = MiniWorldGym("Sidewalk", obs_width=W, obs_height=H)
    env.reset(seed=0)
    env.agent_pos = np.array([2.0, 0.0, 6.0])  # inside the street room
    obs, r, term, trunc, info = env.step(0)
    assert term and r == 0.0


def test_sign_end_action_terminates():
    """Sign's custom end action terminates; no reward unless the agent
    also happens to touch the sign-colored object (sign.py:170-182)."""
    env = MiniWorldGym("Sign", obs_width=W, obs_height=H)
    obs, info = env.reset(seed=0)
    assert isinstance(obs, dict) and set(obs) == {"obs", "goal"}
    env.agent_pos = np.array([5.0, 0.0, 3.0])  # away from all objects
    obs, r, term, trunc, info = env.step(3)
    assert term and r == 0.0


def test_sign_touch_correct_color():
    """Touching the sign-colored object pays +1 (sign.py:177-182)."""
    env = MiniWorldGym("Sign", obs_width=W, obs_height=H)
    env.reset(seed=0)
    ci = env.task["color_index"]
    target = env.entities[ci]  # boxes occupy slots 0-2 in color order
    env.agent_pos = target.pos + np.array([0.3, 0, 0])
    obs, r, term, trunc, info = env.step(0)
    assert term and r == 1.0


def test_collecthealth_drain_and_death():
    env = MiniWorldGym("CollectHealth", obs_width=W, obs_height=H)
    env.reset(seed=0)
    obs, r, term, trunc, info = env.step(np.zeros(6, np.float32))
    assert info["health"] == 98 and r == 2.0
    env.task["health"] = 2
    obs, r, term, trunc, info = env.step(np.zeros(6, np.float32))
    assert term and r == -100.0


def test_putnext_success_condition():
    env = MiniWorldGym("PutNext", obs_width=W, obs_height=H)
    env.reset(seed=0)
    red = env.entities[env.spec_def.red_slot]
    yellow = env.entities[env.spec_def.yellow_slot]
    red.pos = yellow.pos + np.array([red.radius + yellow.radius + 0.05, 0, 0])
    obs, r, term, trunc, info = env.step(np.zeros(6, np.float32))
    assert term and r > 0


def test_navigate_wallgap_reward_once():
    env = MiniWorldGym("NavigateWallGap", obs_width=W, obs_height=H)
    env.reset(seed=0)
    env.agent_pos = np.array([0.0, 0.0, -4.0])  # bottom room
    obs, r, term, trunc, info = env.step(np.zeros(6, np.float32))
    assert term and r == 1.0


def test_cameracontrol_zoom_limits():
    env = MiniWorldGym("CameraControl", obs_width=W, obs_height=H)
    env.reset(seed=0)
    for _ in range(40):
        env.step(4)  # zoom in
    assert env.cam_fov_y == env.spec_def.min_fov
    for _ in range(80):
        env.step(5)  # zoom out
    assert env.cam_fov_y == env.spec_def.max_fov


def test_maze_layouts_differ():
    """Different bank entries are genuinely different mazes."""
    from miniworld_tpu.envs import make_spec

    spec = make_spec("MiniWorld-MazeS2-v0")
    spec.num_layouts = 8
    env = MiniWorldVec(spec, num_envs=4, obs_width=W, obs_height=H,
                       procgen=False)  # the layout BANK is under test
    # maze structure = which neighbor pairs connect = the junction-room
    # placement rows; distinct layouts must appear in an 8-entry bank
    aabbs = env._bank_np.room_aabb
    pats = {tuple(np.round(a[4:].ravel(), 2)) for a in aabbs}
    assert len(pats) >= 2, "all bank layouts are identical mazes"


def test_ymaze_nonrectangular_rooms():
    """YMaze's rotated arms produce non-axis-aligned wall segments."""
    env = MiniWorldVec("MiniWorld-YMaze-v0", num_envs=1, obs_width=W,
                       obs_height=H)
    segs = env._bank_np.segs[0] if env._bank_np.segs.ndim == 4 else env._bank_np.segs
    d = segs[:, 1] - segs[:, 0]
    ang = np.abs(np.arctan2(d[:, 1], d[:, 0]))
    off_axis = (np.abs(np.sin(2 * ang)) > 0.1).sum()
    assert off_axis >= 4  # rotated arm walls


def test_sign_layout_matches_color():
    """Vectorized Sign: layout id == sign color drives the reward."""
    env = MiniWorldVec("MiniWorld-Sign-v0", num_envs=4, obs_width=W,
                       obs_height=H)
    state, obs = env.reset(jax.random.key(0))
    ci = int(state.layout_id[0])
    target = np.asarray(state.ent_pos[0, ci])
    pos = state.pos.at[0].set(jnp.asarray(target + np.array([0.3, 0, 0]),
                                          jnp.float32))
    state = state.replace(pos=pos)
    state, obs, r, d, info = env.step(state, jnp.zeros(4, jnp.int32))
    assert float(r[0]) == 1.0 and bool(d[0])
