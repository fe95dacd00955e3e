"""Interactive env suite: pickup/drop tasks and the Sign env."""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from miniworld_tpu.envs.base import (
    Ctx,
    EnvSpec,
    action_from_components,
    default_discrete_actions,
)
from miniworld_tpu.ops import place as place_ops
from miniworld_tpu.params import DEFAULT_PARAMS
from miniworld_tpu.scene.entities import COLOR_NAMES


@dataclass
class PickupObjects(EnvSpec):
    """Pick up 5 random objects; +1 each, all picked -> done
    (envs/pickupobjects.py:43-103)."""

    name: str = "PickupObjects"
    gym_id: str = "MiniWorld-PickupObjects-v0"
    max_episode_steps: int = 400
    size: float = 12
    num_objs: int = 5
    discrete_actions: np.ndarray = field(
        default_factory=lambda: np.stack(
            [
                action_from_components(turn=-1.0),
                action_from_components(turn=1.0),
                action_from_components(forward=1.0),
                action_from_components(forward=-1.0),
                action_from_components(pickup=1.0),
            ]
        )
    )

    def build(self, world, rng, layout_rng=None, layout_idx=0):
        world.add_rect_room(
            min_x=0, max_x=self.size, min_z=0, max_z=self.size,
            wall_tex="brick_wall", floor_tex="asphalt", no_ceiling=True,
        )
        if rng is not None:
            # Reference rng order per object: choice(3 types), choice(6
            # colors), then placement (pickupobjects.py:76-85).
            for _ in range(self.num_objs):
                t = int(rng.choice(3))
                color = COLOR_NAMES[int(rng.choice(len(COLOR_NAMES)))]
                if t == 1:
                    world.place(world.proto_id("box", color, 0.9))
                elif t == 0:
                    world.place(world.proto_id("ball", color, 0.9))
                else:
                    world.place(world.proto_id("key", color))
        else:
            choices = (
                [world.proto_id("ball", c, 0.9) for c in COLOR_NAMES]
                + [world.proto_id("box", c, 0.9) for c in COLOR_NAMES]
                + [world.proto_id("key", c) for c in COLOR_NAMES]
            )
            for _ in range(self.num_objs):
                world.place(choices)
        world.place_agent()

    def init_task(self):
        return {"num_picked_up": jnp.int32(0)}

    def transition(self, ctx: Ctx):
        # Anything the agent is carrying after the step disappears and
        # scores (pickupobjects.py:94-101).
        s = ctx.state
        has = s.carrying >= 0
        c = jnp.maximum(s.carrying, 0)
        ent_alive = s.ent_alive.at[c].set(
            jnp.where(has, False, s.ent_alive[c])
        )
        n = s.task["num_picked_up"] + jnp.where(has, 1, 0)
        new_state = s.replace(
            ent_alive=ent_alive,
            carrying=jnp.where(has, jnp.int32(-1), s.carrying),
            task={"num_picked_up": n},
        )
        reward = jnp.where(has, 1.0, 0.0)
        term = n >= self.num_objs
        return reward, term, new_state

    def host_reset(self, env, rng):
        return {"num_picked_up": 0}

    def host_transition(self, env, action, reward, termination):
        # pickupobjects.py:94-101
        if env.carrying is not None:
            env.carrying.alive = False
            env.carrying = None
            env.task["num_picked_up"] += 1
            reward += 1.0
            if env.task["num_picked_up"] == self.num_objs:
                termination = True
        return reward, termination


@dataclass
class PutNext(EnvSpec):
    """Put the red box next to the yellow box (envs/putnext.py:49-80).

    Uses the raw 6-D continuous action space (no discrete table).
    """

    name: str = "PutNext"
    gym_id: str = "MiniWorld-PutNext-v0"
    max_episode_steps: int = 250
    size: float = 12
    red_slot: int = 4  # COLOR_NAMES order: blue,green,grey,purple,red,yellow
    yellow_slot: int = 5

    def build(self, world, rng, layout_rng=None, layout_idx=0):
        world.add_rect_room(min_x=0, max_x=self.size, min_z=0, max_z=self.size)
        for color in COLOR_NAMES:
            if rng is not None:
                s = float(rng.uniform(0.6, 0.85))
                world.place(world.proto_id("box", color, s))
            else:
                world.place(
                    world.proto_id("box", color, 1.0), size_lo=0.6, size_hi=0.85
                )
        world.place_agent()

    def transition(self, ctx: Ctx):
        s = ctx.state
        done = (s.carrying < 0) & self.near(s, self.red_slot, self.yellow_slot)
        reward = jnp.where(done, self.reward(s), 0.0)
        return reward, done, s

    def host_transition(self, env, action, reward, termination):
        # putnext.py:72-80
        red = env.entities[self.red_slot]
        yellow = env.entities[self.yellow_slot]
        if env.carrying is None and env.near(red, yellow):
            reward += env._reward()
            termination = True
        return reward, termination


@dataclass
class CollectHealth(EnvSpec):
    """Slime room; health drains 2/step, medkits restore it
    (envs/collecthealth.py:49-102).

    Deviation note: the reference respawn trigger compares the raw
    action to ``Actions.pickup`` (collecthealth.py:83), which cannot be
    truthy for this fork's 6-D vector actions; we implement the intent
    — pickup action while holding a kit respawns it and restores
    health.
    """

    name: str = "CollectHealth"
    gym_id: str = "MiniWorld-CollectHealth-v0"
    max_episode_steps: int = 1000
    size: float = 16
    num_kits: int = 18

    def build(self, world, rng, layout_rng=None, layout_idx=0):
        world.add_rect_room(
            min_x=0, max_x=self.size, min_z=0, max_z=self.size,
            wall_tex="cinder_blocks", floor_tex="slime",
        )
        kit = world.proto_id("mesh", "medkit", 0.40, False)
        for _ in range(self.num_kits):
            world.place(kit)
        world.place_agent()

    def init_task(self):
        return {"health": jnp.int32(100)}

    def transition(self, ctx: Ctx):
        s = ctx.state
        health = s.task["health"] - 2

        pickup_pressed = ctx.action[4] > 0.5
        respawn = pickup_pressed & (s.carrying >= 0)
        c = jnp.maximum(s.carrying, 0)

        # Re-place the carried kit at a fresh random position,
        # collision-checked against walls, other entities and the agent
        # (reference re-enters place_entity; collecthealth.py:86-87).
        key, sub = jax.random.split(s.rng)
        num_ents = s.ent_pos.shape[0]
        ent_xz = s.ent_pos[:, jnp.array([0, 2])]
        ent_xz = jnp.concatenate(
            [ent_xz, jnp.stack([s.pos[0], s.pos[2]])[None, :]], axis=0
        )
        ent_r = jnp.concatenate(
            [s.ent_radius, jnp.array([self.agent_radius], jnp.float32)]
        )
        mask = jnp.concatenate(
            [s.ent_alive & (jnp.arange(num_ents) != c), jnp.array([True])]
        )
        E = ctx.lay.rule_room.shape[0] - 1
        row = jnp.minimum(c, E - 1)
        new_pos, new_dir = place_ops.place_one(
            sub, ctx.lay, ctx.room_segs, s.layout_id,
            ctx.lay.rule_room[row, 0], ctx.lay.rule_bbox[row, 0],
            ctx.lay.rule_pos[row, 0], ctx.lay.rule_dir[row, 0],
            ctx.lay.rule_dir_lo[row, 0], ctx.lay.rule_dir_hi[row, 0],
            s.ent_radius[c], ent_xz, ent_r, mask,
        )
        ent_pos = jnp.where(
            respawn, s.ent_pos.at[c].set(new_pos), s.ent_pos
        )
        ent_dir = jnp.where(respawn, s.ent_dir.at[c].set(new_dir), s.ent_dir)

        health = jnp.where(respawn, jnp.int32(100), health)
        alive = health > 0
        reward = jnp.where(alive, 2.0, -100.0)
        term = ~alive
        new_state = s.replace(
            rng=key,
            ent_pos=ent_pos,
            ent_dir=ent_dir,
            carrying=jnp.where(respawn, jnp.int32(-1), s.carrying),
            task={"health": health},
        )
        return reward, term, new_state

    def info(self, ctx: Ctx):
        return {"health": ctx.state.task["health"]}

    def host_reset(self, env, rng):
        return {"health": 100}

    def host_transition(self, env, action, reward, termination):
        # collecthealth.py:77-102 (see class deviation note)
        env.task["health"] -= 2
        pickup_pressed = (
            np.asarray(action).ndim > 0 and float(np.asarray(action)[4]) > 0.5
        )
        if pickup_pressed and env.carrying is not None:
            kit = env.carrying
            env.carrying = None
            # re-place like reference place_entity (consumes np_random;
            # collision vs current entities + agent)
            rng = env.np_random
            rooms = env.world.rooms
            probs = env.world._room_probs
            while True:
                r = rooms[int(rng.choice(len(rooms), p=probs))]
                pos = rng.uniform(
                    low=[r.min_x - kit.radius, 0, r.min_z - kit.radius],
                    high=[r.max_x + kit.radius, 0, r.max_z + kit.radius],
                )
                if not r.point_inside(pos):
                    continue
                if env.intersect(kit, pos, kit.radius):
                    continue
                kit.pos = pos
                kit.dir = float(rng.uniform(-math.pi, math.pi))
                break
            env.task["health"] = 100
        if env.task["health"] > 0:
            reward += 2.0
        else:
            reward -= 100.0
            termination = True
        return reward, termination

    def host_info(self, env):
        return {"health": env.task["health"]}


@dataclass
class Sign(EnvSpec):
    """U-maze with colored boxes/keys and a colored-word sign
    (envs/sign.py:23-195).

    The sign text is episode-random, so the layout bank has exactly 3
    entries (BLUE/RED/GREEN); the layout index IS the color index.
    Observations are dicts {"obs": image, "goal": 0|1}.
    """

    name: str = "Sign"
    gym_id: str = "MiniWorld-Sign-v0"
    max_episode_steps: int = 200
    size: float = 10
    goal: int = 0
    color_index: int = 0
    num_layouts: int = 3
    dict_obs: bool = True
    # the sign text must be readable: SDF glyphs need K=64 (base.py)
    fourier_k: int = 64
    end_action_index: int = 3
    discrete_actions: np.ndarray = field(
        default_factory=lambda: np.stack(
            [
                action_from_components(turn=-1.0),
                action_from_components(turn=1.0),
                action_from_components(forward=1.0),
                action_from_components(),  # end episode (sign.py:101-110)
            ]
        )
    )

    def __post_init__(self):
        # no_random + big turn steps (sign.py:80-82)
        p = DEFAULT_PARAMS.no_random()
        p.set("forward_step", 0.15)
        p.set("turn_step", 45)
        self.params = p

    def build(self, world, rng, layout_rng=None, layout_idx=0):
        if rng is not None:
            color_index = int(rng.integers(0, 3))  # sign.py:117
            self._eager_color_index = color_index
        else:
            color_index = layout_idx

        gap_size = 0.25
        sz = self.size
        top_room = world.add_rect_room(min_x=0, max_x=sz, min_z=0, max_z=sz * 0.65)
        left_room = world.add_rect_room(
            min_x=0, max_x=sz * 3 / 5, min_z=sz * 0.65 + gap_size, max_z=sz * 1.3
        )
        right_room = world.add_rect_room(
            min_x=sz * 3 / 5, max_x=sz, min_z=sz * 0.65 + gap_size, max_z=sz * 1.3
        )
        world.connect_rooms(top_room, left_room, min_x=0, max_x=sz * 3 / 5)
        world.connect_rooms(
            left_room, right_room, min_z=sz * 0.65 + gap_size, max_z=sz * 1.3
        )

        # Exact placements (sign.py:143-156); each consumes one rng
        # uniform for the direction in eager mode.
        world.place(world.proto_id("box", "blue"), pos=(1, 0, 1))
        world.place(world.proto_id("box", "red"), pos=(9, 0, 1))
        world.place(world.proto_id("box", "green"), pos=(9, 0, 5))
        world.place(world.proto_id("mesh", "key_blue", 0.6, False), pos=(5, 0, 1))
        world.place(world.proto_id("mesh", "key_red", 0.6, False), pos=(1, 0, 5))
        world.place(world.proto_id("mesh", "key_green", 0.6, False), pos=(1, 0, 9))

        text = ["BLUE", "RED", "GREEN"][color_index]
        world.bake_text_frame(
            pos=[sz, 1.35, sz + gap_size], direction=math.pi, text=text, height=1
        )
        world.place_agent(room=top_room)

    # slots: 0-2 boxes (blue,red,green), 3-5 BigKeys (blue,red,green)
    def transition(self, ctx: Ctx):
        s = ctx.state
        color_index = s.layout_id  # bank entry == sign color
        end_requested = ctx.action_idx == self.end_action_index

        touched = jnp.bool_(False)
        for obj_index in range(2):
            for ci in range(3):
                slot = obj_index * 3 + ci
                touched = touched | (
                    self.near_agent(s, slot) & (color_index == ci)
                )
        term = end_requested | touched
        reward = jnp.where(touched, 1.0, 0.0)
        return reward, term, s

    def info(self, ctx: Ctx):
        return {}

    def host_reset(self, env, rng):
        # build() stored the episode's sign color (sign.py:117)
        return {"color_index": self._eager_color_index}

    def host_transition(self, env, action, reward, termination):
        # sign.py:170-182
        end_requested = np.isscalar(action) and int(action) == self.end_action_index
        if end_requested:
            termination = True
        color_index = env.task["color_index"]
        for obj_index in range(2):
            for ci in range(3):
                if env.near(env.entities[obj_index * 3 + ci]) and ci == color_index:
                    termination = True
                    reward = 1.0
        return reward, termination
