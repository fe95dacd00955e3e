"""Wall-mounted camera control envs (pan/tilt/zoom and click-to-aim).

Mirrors envs/cameracontrol.py and envs/cameracontrolclick.py from the
reference: the "agent" is a fixed camera on a random wall; actions move
the camera, not the body. Physics is fully overridden.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from miniworld_tpu.envs.base import Ctx, EnvSpec
from miniworld_tpu.state import EnvState

WALL_OFFSET = 0.1
CAMERA_HEIGHT = 1.5


def _wall_pose_host(wall: int, size: float):
    """Float64 camera position/yaw for wall 0..3 — the host-adapter
    path must not round the mount through f32 (cameracontrol.py:152-179
    stores exact float64 positions)."""
    center = size / 2
    poses = [
        [size - WALL_OFFSET, CAMERA_HEIGHT, center],
        [center, CAMERA_HEIGHT, WALL_OFFSET],
        [WALL_OFFSET, CAMERA_HEIGHT, center],
        [center, CAMERA_HEIGHT, size - WALL_OFFSET],
    ]
    yaws = [math.pi, -math.pi / 2, 0.0, math.pi / 2]
    return np.array(poses[wall], dtype=np.float64), yaws[wall]


def _wall_pose(wall: jax.Array, size: float):
    """Camera position/yaw for wall 0..3 (cameracontrol.py:152-179)."""
    center = size / 2
    poses = jnp.array(
        [
            [size - WALL_OFFSET, CAMERA_HEIGHT, center],  # east, looking west
            [center, CAMERA_HEIGHT, WALL_OFFSET],  # north, looking south
            [WALL_OFFSET, CAMERA_HEIGHT, center],  # west, looking east
            [center, CAMERA_HEIGHT, size - WALL_OFFSET],  # south, looking north
        ],
        dtype=jnp.float32,
    )
    yaws = jnp.array(
        [math.pi, -math.pi / 2, 0.0, math.pi / 2], dtype=jnp.float32
    )
    return poses[wall], yaws[wall]


def draw_crosshair(rgb: jax.Array) -> jax.Array:
    """Red crosshair overlay (cameracontrol.py:302-331), drawn with
    masks instead of cv2 so it stays on device."""
    h, w = rgb.shape[0], rgb.shape[1]
    cx, cy = w // 2, h // 2
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    gap, length, half_t = 4, 20, 1

    horiz = (jnp.abs(ys - cy) <= half_t) & (
        ((xs >= cx - length - gap) & (xs <= cx - gap))
        | ((xs >= cx + gap) & (xs <= cx + length + gap))
    )
    vert = (jnp.abs(xs - cx) <= half_t) & (
        ((ys >= cy - length - gap) & (ys <= cy - gap))
        | ((ys >= cy + gap) & (ys <= cy + length + gap))
    )
    dot = (xs - cx) ** 2 + (ys - cy) ** 2 <= 9
    mask = (horiz | vert | dot)[:, :, None]
    red = jnp.array([255, 0, 0], dtype=rgb.dtype)
    return jnp.where(mask, red[None, None, :], rgb)


@dataclass
class CameraControl(EnvSpec):
    """Discrete pan/tilt/zoom camera centering a green key
    (envs/cameracontrol.py:24-331)."""

    name: str = "CameraControl"
    gym_id: str = "MiniWorld-CameraControl-v0"
    max_episode_steps: int = 500
    size: float = 8
    pan_speed: float = 5.0
    tilt_speed: float = 5.0
    zoom_speed: float = 2.0
    center_threshold: float = 0.15
    min_fov: float = 20.0
    max_fov: float = 90.0
    override_physics: bool = True
    num_actions: int = 6  # Discrete(6), no 6-D table
    key_slot: int = 0
    # HUD buttons -> discrete actions (cameracontrol.py:125-132)
    control_action_map = {
        "pan_left": 0, "pan_right": 1, "tilt_up": 2, "tilt_down": 3,
        "zoom_in": 4, "zoom_out": 5,
    }

    def build(self, world, rng, layout_rng=None, layout_idx=0):
        world.add_rect_room(min_x=0, max_x=self.size, min_z=0, max_z=self.size)
        world.place(world.proto_id("key", "green"))
        world.place(world.proto_id("ball", "red"))
        world.place(world.proto_id("box", "blue"))
        world.place_agent_at(pos=np.array([0.5, 0, 0.5]), direction=0.0)
        if rng is not None:
            self._eager_wall = int(rng.integers(0, 4))  # cameracontrol.py:155

    def init_task(self):
        return {"camera_wall": jnp.int32(0)}

    def post_reset(self, lay, state: EnvState, key: jax.Array) -> EnvState:
        wall = jax.random.randint(key, (), 0, 4)
        pos, yaw = _wall_pose(wall, self.size)
        return state.replace(
            pos=pos.at[1].set(0.0),
            dir=yaw,
            cam_pitch=jnp.float32(0.0),
            cam_fov_y=jnp.float32(60.0),
            cam_height=jnp.float32(CAMERA_HEIGHT),
            cam_fwd_disp=jnp.float32(0.0),
            task={"camera_wall": wall.astype(jnp.int32)},
        )

    def apply_action(self, lay, state: EnvState, action: jax.Array) -> EnvState:
        """action: () int32 in [0,6) (cameracontrol.py:199-211)."""
        a = action.astype(jnp.int32)
        yaw = state.dir
        pitch = state.cam_pitch
        fov = state.cam_fov_y
        rad = self.pan_speed * math.pi / 180.0
        yaw = yaw + jnp.where(a == 0, rad, 0.0) - jnp.where(a == 1, rad, 0.0)
        pitch = jnp.where(a == 2, jnp.minimum(89.0, pitch + self.tilt_speed), pitch)
        pitch = jnp.where(a == 3, jnp.maximum(-89.0, pitch - self.tilt_speed), pitch)
        fov = jnp.where(a == 4, jnp.maximum(self.min_fov, fov - self.zoom_speed), fov)
        fov = jnp.where(a == 5, jnp.minimum(self.max_fov, fov + self.zoom_speed), fov)
        return state.replace(dir=yaw, cam_pitch=pitch, cam_fov_y=fov)

    def _key_centered(self, state: EnvState):
        """(is_centered, normalized distance) (cameracontrol.py:246-290)."""
        key_pos = state.ent_pos[self.key_slot]
        key_pos = key_pos.at[1].set(state.ent_height[self.key_slot] / 2)
        cam_pos = state.pos.at[1].set(state.cam_height)
        to_key = key_pos - cam_pos
        dist = jnp.linalg.norm(to_key)
        to_key_n = to_key / jnp.maximum(dist, 1e-9)
        pitch_rad = jnp.deg2rad(state.cam_pitch)
        cam_dir = jnp.stack(
            [
                jnp.cos(pitch_rad) * jnp.cos(state.dir),
                jnp.sin(pitch_rad),
                -jnp.cos(pitch_rad) * jnp.sin(state.dir),
            ]
        )
        dot = jnp.clip(jnp.dot(cam_dir, to_key_n), -1.0, 1.0)
        angle = jnp.arccos(dot)
        half_fov = jnp.deg2rad(state.cam_fov_y / 2)
        nd = angle / half_fov
        centered = (nd <= self.center_threshold) | (dist < 0.01)
        return centered, jnp.minimum(nd, 1.0)

    def transition(self, ctx: Ctx):
        centered, _ = self._key_centered(ctx.state)
        reward = jnp.where(centered, self.reward(ctx.state), 0.0)
        return reward, centered, ctx.state

    def post_render(self, rgb: jax.Array, state: EnvState) -> jax.Array:
        return draw_crosshair(rgb)

    def info(self, ctx: Ctx):
        centered, nd = self._key_centered(ctx.state)
        return {
            "camera_yaw": ctx.state.dir,
            "camera_pitch": ctx.state.cam_pitch,
            "camera_fov": ctx.state.cam_fov_y,
            "camera_wall": ctx.state.task["camera_wall"],
            "key_centered": centered,
            "distance_from_center": nd,
        }

    # ---- host-side (gymnasium adapter) --------------------------------

    def host_reset(self, env, rng):
        wall = self._eager_wall
        pos, yaw = _wall_pose_host(int(wall), self.size)
        env.agent_pos = pos * np.array([1.0, 0.0, 1.0])
        env.agent_dir = float(yaw)
        env.cam_pitch = 0.0
        env.cam_fov_y = 60.0
        env.cam_height = CAMERA_HEIGHT
        env.cam_fwd_disp = 0.0
        return {"camera_wall": wall}

    def host_apply_action(self, env, action):
        """cameracontrol.py:199-211, float64 host."""
        a = int(action)
        if a == 0:
            env.agent_dir += self.pan_speed * math.pi / 180.0
        elif a == 1:
            env.agent_dir -= self.pan_speed * math.pi / 180.0
        elif a == 2:
            env.cam_pitch = min(89.0, env.cam_pitch + self.tilt_speed)
        elif a == 3:
            env.cam_pitch = max(-89.0, env.cam_pitch - self.tilt_speed)
        elif a == 4:
            env.cam_fov_y = max(self.min_fov, env.cam_fov_y - self.zoom_speed)
        elif a == 5:
            env.cam_fov_y = min(self.max_fov, env.cam_fov_y + self.zoom_speed)

    def _host_key_centered(self, env):
        key = env.entities[self.key_slot]
        key_pos = key.pos.copy()
        key_pos[1] = key.height / 2
        cam_pos = env.agent_pos.copy()
        cam_pos[1] = env.cam_height
        to_key = key_pos - cam_pos
        dist = np.linalg.norm(to_key)
        if dist < 0.01:
            return True, 0.0
        to_key_n = to_key / dist
        pitch_rad = math.radians(env.cam_pitch)
        cam_dir = np.array([
            math.cos(pitch_rad) * math.cos(env.agent_dir),
            math.sin(pitch_rad),
            -math.cos(pitch_rad) * math.sin(env.agent_dir),
        ])
        angle = math.acos(float(np.clip(np.dot(cam_dir, to_key_n), -1, 1)))
        nd = angle / math.radians(env.cam_fov_y / 2)
        return nd <= self.center_threshold, min(nd, 1.0)

    def host_transition(self, env, action, reward, termination):
        centered, _ = self._host_key_centered(env)
        if centered:
            reward += env._reward()
            termination = True
        return reward, termination

    def host_info(self, env):
        centered, nd = self._host_key_centered(env)
        return {
            "camera_yaw": env.agent_dir,
            "camera_pitch": env.cam_pitch,
            "camera_fov": env.cam_fov_y,
            "camera_wall": env.task["camera_wall"],
            "key_centered": centered,
            "distance_from_center": nd,
        }

    def host_post_render(self, rgb, env):
        return np.asarray(draw_crosshair(jnp.asarray(rgb)))


@dataclass
class CameraControlClick(CameraControl):
    """Click-to-aim variant: Box(2) normalized click coordinates
    (envs/cameracontrolclick.py:44-217)."""

    name: str = "CameraControlClick"
    gym_id: str = "MiniWorld-CameraControlClick-v0"
    movement_scale: float = 0.5
    num_actions: int = 0  # continuous Box(2)
    click_action: bool = True

    def apply_action(self, lay, state: EnvState, action: jax.Array) -> EnvState:
        """action: (2,) f32 normalized click coords."""
        dx = action[0] - 0.5
        dy = action[1] - 0.5
        distance = jnp.sqrt(dx * dx + dy * dy)
        safe = jnp.maximum(distance, 1e-9)
        dir_x, dir_y = dx / safe, dy / safe
        fov_scale = state.cam_fov_y / 60.0
        pan = -dir_x * self.pan_speed * self.movement_scale * fov_scale
        tilt = -dir_y * self.tilt_speed * self.movement_scale * fov_scale
        move = distance > 0.01
        yaw = state.dir + jnp.where(move, pan * math.pi / 180.0, 0.0)
        pitch = jnp.clip(
            state.cam_pitch + jnp.where(move, tilt, 0.0), -89.0, 89.0
        )
        return state.replace(dir=yaw, cam_pitch=pitch)

    def host_apply_action(self, env, action):
        """cameracontrolclick.py:157-217, float64 host."""
        dx = float(action[0]) - 0.5
        dy = float(action[1]) - 0.5
        distance = math.sqrt(dx * dx + dy * dy)
        if distance <= 0.01:
            return
        dir_x, dir_y = dx / distance, dy / distance
        fov_scale = env.cam_fov_y / 60.0
        pan = -dir_x * self.pan_speed * self.movement_scale * fov_scale
        tilt = -dir_y * self.tilt_speed * self.movement_scale * fov_scale
        env.agent_dir += pan * math.pi / 180.0
        env.cam_pitch = float(np.clip(env.cam_pitch + tilt, -89.0, 89.0))
