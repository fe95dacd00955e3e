"""Agent dynamics, collision, pickup/drop — pure jitted step physics.

Transcribes the semantics of the reference hot loop
(MiniWorldEnv.step/move_agent/_update_agent_orientation/intersect,
miniworld/miniworld.py:691-813, 1020-1058) into pure functions over
``EnvState`` with fixed shapes. All functions operate on a single env;
the vector layer vmaps them.

Key behavioral details preserved:
  * orientation updates before movement; both revert if the carried
    object would collide (miniworld.py:719-745);
  * blocked moves cancel the whole translation (miniworld.py:691-717);
  * strafe distance gets the forward_drift added even for zero strafe
    action (miniworld.py:786);
  * pickup probes at pos + 1.5*r_agent along the facing direction with
    radius 1.2*r_agent, walls shadow entities, and the *first* entity
    in slot order wins — a static first hit blocks pickup entirely
    (miniworld.py:789-793, 1020-1046);
  * drop zeroes the carried object's Y (miniworld.py:795-797).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from miniworld_tpu.ops import geom
from miniworld_tpu.state import EnvState, StepResult

AGENT_RADIUS = 0.4  # miniworld/entity.py:470
PITCH_LIMIT = 89.0  # miniworld/miniworld.py:729-731


def intersect(
    segs4,
    state: EnvState,
    pos: jax.Array,
    radius: jax.Array,
    skip_ent: jax.Array | int = -1,
    include_agent: bool = False,
    agent_radius: float = AGENT_RADIUS,
):
    """Collision query (miniworld.py:1020-1046): Y is ignored.

    ``segs4`` is the (4, NS) component-major wall-segment pack for the
    agent's current room (Layout.room_segs) — conservative room-local
    collision instead of all-walls scans (see scene/compile.py).

    Returns (wall_hit: bool, first_ent: int32 or -1). When
    ``include_agent`` the agent's bounding circle is also tested (the
    reference keeps the agent in the entity list; carried-object and
    respawn queries can see it). The agent hit is reported as index E
    (one past the entity table).
    """
    pos_xz = jnp.stack([pos[..., 0], pos[..., 2]], axis=-1)
    wall_hit = geom.circle_segs4(pos_xz, radius, segs4)

    num_ents = state.ent_pos.shape[0]
    idxs = jnp.arange(num_ents)
    mask = state.ent_alive & (idxs != skip_ent)
    ent_xz = state.ent_pos[:, jnp.array([0, 2])]
    first_ent = geom.circle_vs_entities(pos_xz, radius, ent_xz, state.ent_radius, mask)

    if include_agent:
        agent_xz = jnp.stack([state.pos[0], state.pos[2]])
        d2 = jnp.sum((agent_xz - pos_xz) ** 2)
        rsum = radius + agent_radius
        agent_hit = d2 < rsum * rsum
        first_ent = jnp.where(
            (first_ent < 0) & agent_hit, jnp.int32(num_ents), first_ent
        )
    return wall_hit, first_ent


def carry_pos(state: EnvState, agent_pos: jax.Array, ent_idx: jax.Array,
              max_forward_step: float, agent_radius: float = AGENT_RADIUS) -> jax.Array:
    """Position of a carried object (miniworld.py:677-689)."""
    r_e = state.ent_radius[ent_idx]
    h_e = state.ent_height[ent_idx]
    dist = agent_radius + r_e + max_forward_step
    p = agent_pos + geom.yaw_dir_vec(state.dir) * 1.05 * dist
    y = jnp.maximum(state.cam_height - h_e - 0.3, 0.0)
    return p.at[1].set(y)


def _with_carry_update(state: EnvState, ent_idx, new_pos):
    ent_pos = state.ent_pos.at[ent_idx].set(new_pos)
    ent_dir = state.ent_dir.at[ent_idx].set(state.dir)
    return state.replace(ent_pos=ent_pos, ent_dir=ent_dir)


def update_orientation(
    segs4, state: EnvState, yaw_delta, pitch_delta, max_forward_step: float,
    agent_radius: float = AGENT_RADIUS,
) -> EnvState:
    """Yaw/pitch update with carried-object collision revert
    (miniworld.py:719-745).

    Straight-line (mask-based) control flow: under vmap a lax.cond
    lowers to select anyway, so branches are computed unconditionally
    and selected by predicate.
    """
    has_carry = state.carrying >= 0
    c = jnp.maximum(state.carrying, 0)
    new_dir = state.dir + yaw_delta
    new_pitch = jnp.clip(state.cam_pitch + pitch_delta, -PITCH_LIMIT, PITCH_LIMIT)
    turned = state.replace(dir=new_dir, cam_pitch=new_pitch)

    p = carry_pos(turned, turned.pos, c, max_forward_step, agent_radius)
    wall_hit, ent_hit = intersect(
        segs4, turned, p, turned.ent_radius[c], skip_ent=c, include_agent=True,
        agent_radius=agent_radius,
    )
    blocked = has_carry & (wall_hit | (ent_hit >= 0))
    apply_carry = has_carry & ~blocked

    ent_pos = jnp.where(apply_carry, turned.ent_pos.at[c].set(p), turned.ent_pos)
    ent_dir = jnp.where(
        apply_carry, turned.ent_dir.at[c].set(turned.dir), turned.ent_dir
    )
    return turned.replace(
        dir=jnp.where(blocked, state.dir, turned.dir),
        cam_pitch=jnp.where(blocked, state.cam_pitch, turned.cam_pitch),
        ent_pos=ent_pos,
        ent_dir=ent_dir,
    )


def move_agent(
    segs4, state: EnvState, fwd_dist, strafe_dist, max_forward_step: float,
    agent_radius: float = AGENT_RADIUS,
):
    """Translation with collision + carried object (miniworld.py:691-717).

    Mask-based: the move applies only if the agent circle is free at the
    target AND (when carrying) the carried object is free at its new
    carry position."""
    has_carry = state.carrying >= 0
    c = jnp.maximum(state.carrying, 0)
    next_pos = (
        state.pos
        + geom.yaw_dir_vec(state.dir) * fwd_dist
        + geom.yaw_right_vec(state.dir) * strafe_dist
    )
    wall_hit, ent_hit = intersect(segs4, state, next_pos, agent_radius)
    agent_blocked = wall_hit | (ent_hit >= 0)

    p = carry_pos(state, next_pos, c, max_forward_step, agent_radius)
    w2, e2 = intersect(segs4, state, p, state.ent_radius[c], skip_ent=c,
                       include_agent=True, agent_radius=agent_radius)
    carry_blocked = has_carry & (w2 | (e2 >= 0))

    moved = ~agent_blocked & ~carry_blocked
    apply_carry = moved & has_carry

    ent_pos = jnp.where(apply_carry, state.ent_pos.at[c].set(p), state.ent_pos)
    ent_dir = jnp.where(
        apply_carry, state.ent_dir.at[c].set(state.dir), state.ent_dir
    )
    new_state = state.replace(
        pos=jnp.where(moved, next_pos, state.pos),
        ent_pos=ent_pos,
        ent_dir=ent_dir,
    )
    return new_state, moved


def physics_step(
    lay,
    state: EnvState,
    action: jax.Array,
    *,
    segs4,
    max_forward_step: float,
    fwd_step,
    fwd_drift,
    turn_step,
    agent_radius: float = AGENT_RADIUS,
):
    """One physics step from a clipped 6-D action vector
    (miniworld.py:778-797). Returns (state, StepResult).

    ``fwd_step``/``fwd_drift``/``turn_step`` are this step's (possibly
    domain-randomized) parameter samples; ``max_forward_step`` is the
    static params maximum used by carry distances and ``near``.
    """
    yaw_delta = action[2] * turn_step * (math.pi / 180.0)
    pitch_delta = action[3] * turn_step
    state = update_orientation(segs4, state, yaw_delta, pitch_delta,
                               max_forward_step, agent_radius)

    forward_dist = action[0] * fwd_step
    strafe_dist = action[1] * fwd_step + fwd_drift
    state, moved = move_agent(segs4, state, forward_dist, strafe_dist,
                              max_forward_step, agent_radius)

    # Pickup probe (miniworld.py:789-793)
    test_pos = state.pos + geom.yaw_dir_vec(state.dir) * 1.5 * agent_radius
    wall_hit, first_ent = intersect(segs4, state, test_pos, 1.2 * agent_radius)
    can_pick = (
        (action[4] > 0.5)
        & (state.carrying < 0)
        & ~wall_hit
        & (first_ent >= 0)
        & lay.proto_pickable[state.ent_proto[jnp.maximum(first_ent, 0)]]
    )
    picked = jnp.where(can_pick, first_ent, jnp.int32(-1))
    state = state.replace(
        carrying=jnp.where(can_pick, first_ent, state.carrying)
    )

    # Drop (miniworld.py:795-797)
    do_drop = (action[5] > 0.5) & (state.carrying >= 0)
    c = jnp.maximum(state.carrying, 0)
    dropped_pos = state.ent_pos.at[c, 1].set(
        jnp.where(do_drop, 0.0, state.ent_pos[c, 1])
    )
    dropped = jnp.where(do_drop, state.carrying, jnp.int32(-1))
    state = state.replace(
        ent_pos=dropped_pos,
        carrying=jnp.where(do_drop, jnp.int32(-1), state.carrying),
    )

    return state, StepResult(moved=moved, picked_up=picked, dropped=dropped)


def near(state: EnvState, idx0, idx1=None, *, max_forward_step: float,
         agent_radius: float = AGENT_RADIUS):
    """Proximity predicate (miniworld.py:1048-1058): full 3-D distance
    vs r0 + r1 + 1.1 * max forward step. ``idx1=None`` means the agent."""
    p0 = state.ent_pos[idx0]
    r0 = state.ent_radius[idx0]
    if idx1 is None:
        p1, r1 = state.pos, agent_radius
    else:
        p1, r1 = state.ent_pos[idx1], state.ent_radius[idx1]
    dist = jnp.linalg.norm(p0 - p1)
    return dist < r0 + r1 + 1.1 * max_forward_step


def clip_action(action: jax.Array) -> jax.Array:
    """Clip a 6-D action to the Box bounds (miniworld.py:483-487).

    NaNs map to 0 (clip alone passes them through and would poison the
    agent pose for the rest of the run).
    """
    low = jnp.array([-1.0, -1.0, -1.0, -1.0, 0.0, 0.0], dtype=jnp.float32)
    high = jnp.array([1.0, 1.0, 1.0, 1.0, 1.0, 1.0], dtype=jnp.float32)
    return jnp.clip(jnp.nan_to_num(action), low, high)
