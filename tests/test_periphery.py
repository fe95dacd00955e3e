"""Periphery components: wrappers, HUD, recorder, checkpointing,
visibility, scripts. Mirrors the reference wrapper tests
(tests/test_miniworld.py:44-71) and extends to the new subsystems."""

import json
import math

import numpy as np
import pytest

from miniworld_tpu.gym_env import MiniWorldGym

W, H = 32, 24


@pytest.fixture(scope="module")
def env():
    return MiniWorldGym("OneRoomS6Fast", obs_width=W, obs_height=H)


def test_pytorch_wrapper(env):
    from miniworld_tpu.wrappers import PyTorchObsWrapper

    w = PyTorchObsWrapper(env)
    obs, _ = w.reset(seed=0)
    assert obs.shape == (3, W, H)
    obs, *_ = w.step(w.action_space.sample())
    assert obs.shape == (3, W, H)


def test_greyscale_wrapper(env):
    from miniworld_tpu.wrappers import GreyscaleWrapper

    w = GreyscaleWrapper(env)
    obs, _ = w.reset(seed=0)
    assert obs.shape == (H, W, 1)
    # luma weights (wrappers.py:37-41)
    rgb, _ = env.reset(seed=0)
    expect = 0.30 * rgb[..., 0] + 0.59 * rgb[..., 1] + 0.11 * rgb[..., 2]
    obs, _ = w.reset(seed=0)
    np.testing.assert_allclose(obs[..., 0], expect.astype(np.uint8), atol=1)


def test_stochastic_wrapper(env):
    from miniworld_tpu.wrappers import StochasticActionWrapper

    w = StochasticActionWrapper(env, prob=0.9)
    w.reset(seed=0)
    for _ in range(5):
        w.step(w.action_space.sample())


def test_batched_wrapper_fns():
    import jax.numpy as jnp

    from miniworld_tpu.wrappers import greyscale_obs, pytorch_obs

    obs = jnp.zeros((2, H, W, 3), jnp.uint8).at[:, :, :, 1].set(100)
    assert pytorch_obs(obs).shape == (2, 3, W, H)
    g = greyscale_obs(obs)
    assert g.shape == (2, H, W, 1)
    assert abs(int(g[0, 0, 0, 0]) - 59) <= 1  # 0.59 * 100, f32 rounding


def test_hud_layout_and_hit():
    from miniworld_tpu import hud

    boxes = hud.control_layout(80, 60, [n for n, _ in hud.DEFAULT_CONTROLS])
    assert len(boxes) == len(hud.DEFAULT_CONTROLS)
    name = next(iter(boxes))
    x0, y0, x1, y1 = boxes[name]
    assert hud.hit_test(boxes, (x0 + x1) // 2, (y0 + y1) // 2) == name
    assert hud.hit_test(boxes, 0, 0) is None
    frame = np.zeros((60, 80, 3), np.uint8)
    out = hud.draw_controls(frame, boxes, hover=name)
    assert out.sum() > 0 and out.shape == frame.shape


def test_compose_human_frame():
    """Human render view: pose text + top-view PiP (miniworld.py:1678-1790)."""
    from miniworld_tpu import hud

    obs = np.full((60, 80, 3), 40, np.uint8)
    tv = np.full((30, 40, 3), 200, np.uint8)
    out = hud.compose_human_frame(obs, tv, (4.25, -0.4, 1.57))
    assert out.shape == obs.shape and out.dtype == np.uint8
    assert np.all(obs == 40)  # input untouched
    # thumbnail blitted top-right with white border
    assert np.any(out[4:16, -24:-4] != 40)
    assert np.all(out[1, -10:-3] == 255)
    # yellow pose glyphs top-left
    assert np.any((out[2:8, 2:60] == [255, 255, 0]).all(-1))
    # no top view / no pose -> pure copy
    assert np.array_equal(hud.compose_human_frame(obs, None, None), obs)


def test_control_action_default_and_camera(env):
    act = env.control_action("fwd")
    assert act == 2 or (hasattr(act, "shape") and act[0] == 1.0)
    cam = MiniWorldGym("CameraControl", obs_width=W, obs_height=H)
    assert cam.control_action("zoom_in") == 4
    assert "pan_left" in cam.control_boxes


def test_recorder_roundtrip(tmp_path, env):
    pytest.importorskip("pyarrow")
    from miniworld_tpu.manual_control import Recorder

    rec = Recorder(str(tmp_path / "ds"), fps=10)
    rec.start()
    obs, info = env.reset(seed=1)
    for t in range(4):
        obs, r, term, trunc, info = env.step(env.action_space.sample())
        rec.add(obs, np.zeros(6, np.float32), info, r, term or trunc)
    rec.stop()
    info_json = json.loads((tmp_path / "ds" / "meta" / "info.json").read_text())
    assert info_json["total_frames"] == 4
    # state vector carries [pos, yaw, pitch, extras]
    assert info_json["features"]["observation.state"]["shape"][0] >= 5


def test_checkpoint_roundtrip(tmp_path):
    pytest.importorskip("orbax.checkpoint")
    import jax

    from miniworld_tpu import MiniWorldVec
    from miniworld_tpu.utils import checkpoint

    env = MiniWorldVec("MiniWorld-OneRoomS6Fast-v0", num_envs=2,
                       obs_width=W, obs_height=H)
    state, _ = env.reset(jax.random.key(0))
    path = str(tmp_path / "ckpt")
    checkpoint.save(path, state)
    restored = checkpoint.restore(path, like=state)
    np.testing.assert_array_equal(np.asarray(state.pos),
                                  np.asarray(restored.pos))


def test_visible_ents_vector():
    import jax
    import jax.numpy as jnp

    from miniworld_tpu import MiniWorldVec

    env = MiniWorldVec("MiniWorld-OneRoom-v0", num_envs=1, obs_width=W,
                       obs_height=H)
    state, _ = env.reset(jax.random.key(0))
    box = np.asarray(state.ent_pos[0, 0])
    # stand 3 m from the box facing it: close enough that the 0.2 m GL
    # query box spans a pixel at 32x24, far enough that it is not below
    # the 60-degree frustum (the camera sits at 1.5 m height — at 2 m
    # the ground box is outside the fov and GL answers invisible too)
    agent = box + np.asarray([3.0, 0.0, 0.0]) * np.where(
        box[0] > 5.0, -1.0, 1.0
    )
    d = box - agent
    face = math.atan2(-d[2], d[0])
    state = state.replace(pos=jnp.asarray([agent], jnp.float32))
    state_facing = state.replace(
        dir=jnp.asarray([face], jnp.float32),
        cam_pitch=jnp.asarray([0.0], jnp.float32),
    )
    state_away = state_facing.replace(
        dir=jnp.asarray([face + math.pi], jnp.float32)
    )
    assert bool(env.visible_ents(state_facing)[0, 0])
    assert not bool(env.visible_ents(state_away)[0, 0])


def test_scripted_control_records(tmp_path, env):
    pytest.importorskip("pyarrow")
    from miniworld_tpu.manual_control import ScriptedControl

    ScriptedControl(env, "random", str(tmp_path / "ds"), fps=10).run(
        num_steps=6, seed=0
    )
    info_json = json.loads((tmp_path / "ds" / "meta" / "info.json").read_text())
    assert info_json["total_frames"] == 6


def test_top_view_options(env):
    """render_top_view(render_agent=, return_scale=) parity
    (miniworld.py:1171, 1245-1256)."""
    env.reset(seed=0)
    with_agent = env.render_top_view(64, 48)
    without = env.render_top_view(64, 48, render_agent=False)
    assert with_agent.shape == without.shape == (48, 64, 3)
    # the red marker only exists in the render_agent view
    red = (with_agent[..., 0] == 255) & (with_agent[..., 1] == 0)
    red_off = (without[..., 0] == 255) & (without[..., 1] == 0)
    assert red.any() and not red_off.any()
    img, scale = env.render_top_view(64, 48, return_scale=True)
    assert img.shape == (48, 64, 3)
    assert set(scale) == {"x_scale", "z_scale", "x_offset", "z_offset"}
    # the agent's world position maps inside the image through the scale
    px = env.agent_pos[0] * scale["x_scale"] + scale["x_offset"]
    pz = env.agent_pos[2] * scale["z_scale"] + scale["z_offset"]
    assert 0 <= px < 64 and 0 <= pz < 48
    # ...and the marker actually sits there (within the triangle size)
    ys, xs = np.nonzero(red)
    assert abs(xs.mean() - px) < 6 and abs(ys.mean() - pz) < 6


def test_manual_control_cli_flags():
    """The reference CLI surface parses (scripts/manual_control.py:16-140)
    and the viewer accepts every flag (no display started)."""
    import importlib.util
    import os
    import sys
    from unittest import mock

    path = os.path.join(os.path.dirname(__file__), "..", "scripts",
                        "manual_control.py")
    spec = importlib.util.spec_from_file_location("mc_cli", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    argv = ["prog", "--env-name", "MiniWorld-OneRoomS6Fast-v0",
            "--no-time-limit", "--mouse-sensitivity", "0.2",
            "--fullscreen", "--window-size", "640x480", "--hide-hud",
            "--no-show-controls", "--task", "t", "--append",
            "--automatic-recording", "--no-mouse-recenter",
            "--obs-width", "32", "--obs-height", "24", "--seed", "3"]
    with mock.patch.object(sys, "argv", argv), \
            mock.patch("miniworld_tpu.manual_control.ManualControl") as mc:
        mod.main()
    (env_arg,), kw = mc.call_args
    assert env_arg.max_episode_steps == 10**9          # --no-time-limit
    assert kw["mouse_sensitivity"] == 0.2
    assert kw["fullscreen"] and kw["window_size"] == (640, 480)
    assert kw["show_hud"] is False and kw["show_controls"] is False
    assert kw["mouse_recenter"] is False
    assert kw["automatic_recording"] and kw["append"]
    assert kw["task"] == "t"
    mc.return_value.run.assert_called_once_with(seed=3)


ENV_CHECK_IDS = ["OneRoomS6Fast", "Hallway", "PutNext", "Sign", "CameraControlClick"]


@pytest.mark.parametrize("name", ENV_CHECK_IDS)
def test_env_checker(name):
    """gymnasium conformance (tests/test_miniworld.py:131-158 analog)."""
    import warnings

    from gymnasium.utils.env_checker import check_env

    env = MiniWorldGym(name, obs_width=W, obs_height=H)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        check_env(env, skip_render_check=True)


@pytest.mark.parametrize("name", ["Hallway", "FourRooms", "MazeS2", "Sign",
                                  "PickupObjects", "CameraControl"])
def test_pickle_env(name):
    """EzPickle round-trip: the rebuilt env reproduces reset/step
    exactly (reference tests/test_miniworld.py:161-174)."""
    import pickle

    from miniworld_tpu.gym_env import MiniWorldGym

    import jax

    env = MiniWorldGym(name, obs_width=24, obs_height=18)
    env.reset(seed=5)
    env2 = pickle.loads(pickle.dumps(env))
    o1, i1 = env.reset(seed=9)
    o2, i2 = env2.reset(seed=9)
    a = 0
    r1 = env.step(a)
    r2 = env2.step(a)
    leaves1 = jax.tree.leaves((o1, i1, r1))
    leaves2 = jax.tree.leaves((o2, i2, r2))
    assert len(leaves1) == len(leaves2)
    for x, y in zip(leaves1, leaves2):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    env.close(), env2.close()


def test_view_top_observation_mode():
    """view="top" (miniworld.py:470, 524-526): per-step observations are
    the orthographic top view, agent marker included — on both paths."""
    import jax

    from miniworld_tpu.vector import MiniWorldVec

    # gym adapter: obs must equal render_top_view(render_agent=True)
    env = MiniWorldGym("OneRoomS6Fast", obs_width=W, obs_height=H,
                       view="top")
    obs, _ = env.reset(seed=3)
    assert obs.shape == (H, W, 3)
    np.testing.assert_array_equal(obs, env.render_top_view(render_agent=True))
    obs2, *_ = env.step(2)  # forward
    np.testing.assert_array_equal(obs2, env.render_top_view(render_agent=True))
    # the red agent marker is in frame (pure-red pixels)
    red = (obs[..., 0] == 255) & (obs[..., 1] == 0) & (obs[..., 2] == 0)
    assert red.any()
    env.close()

    # vectorized engine: same kwarg, same obs space, marker present,
    # obs varies as the agent moves
    venv = MiniWorldVec("MiniWorld-OneRoomS6Fast-v0", num_envs=2,
                        obs_width=W, obs_height=H, view="top")
    state, (o, d) = venv.reset(jax.random.key(0))
    assert o.shape == (2, H, W, 3) and d.shape == (2, H, W, 1)
    o = np.asarray(o)
    red = (o[..., 0] == 255) & (o[..., 1] == 0) & (o[..., 2] == 0)
    assert red.reshape(2, -1).any(axis=1).all()
    acts = np.full((2,), 2)  # forward
    state2, (o2, _), *_ = venv.step(state, jax.numpy.asarray(acts))
    assert np.any(np.asarray(o2) != o)
