"""Entity visibility query (get_visible_ents parity).

The reference answers "which entities are visible from the camera"
with GL occlusion queries: it re-renders a small box at each entity's
position and asks the GPU whether any sample passed the depth test
(miniworld/miniworld.py:1576-1670). The TPU-native equivalent casts a
small bundle of probe rays from the camera at each entity's bounding
volume and tests them against the static triangle soup: an entity is
visible iff some probe ray (a) lies inside the view frustum and (b) is
not occluded by static geometry closer than the entity.

Dynamic entities occluding each other are ignored — matching the
reference, whose occlusion pass renders the *static* scene into the
depth buffer before issuing the queries.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from miniworld_tpu.ops import geom
from miniworld_tpu.render.raycast import FAR, NEAR

# probe offsets as fractions of (radius, height): center + 4 corners
_PROBE_OFFS = [
    (0.0, 0.5),
    (-0.8, 0.1), (0.8, 0.1),
    (-0.8, 0.9), (0.8, 0.9),
]


def _static_hit_t(bank, layout_id, origin, dirs, tri_chunk: int = 128):
    """Nearest static-triangle hit distance per probe ray (N,)."""
    num_tris = bank.tri_verts.shape[-3]
    tri_chunk = min(tri_chunk, num_tris)
    n_chunks = -(-num_tris // tri_chunk)

    def body(t_best, c):
        start = jnp.minimum(c * tri_chunk, num_tris - tri_chunk)
        verts = jax.lax.dynamic_slice(
            bank.tri_verts, (layout_id, start, 0, 0), (1, tri_chunk, 3, 3)
        )[0]
        mask = jax.lax.dynamic_slice(
            bank.tri_mask, (layout_id, start), (1, tri_chunk)
        )[0]
        v0 = verts[:, 0]
        e1 = verts[:, 1] - v0
        e2 = verts[:, 2] - v0
        s = origin[None, :] - v0
        g_det = jnp.cross(e2, e1)
        g_u = jnp.cross(e2, s)
        g_v = jnp.cross(s, e1)
        t_num = jnp.sum(e2 * g_v, axis=-1)
        det = dirs @ g_det.T
        u_num = dirs @ g_u.T
        v_num = dirs @ g_v.T
        inv_det = 1.0 / jnp.where(jnp.abs(det) > 1e-12, det, 1.0)
        t = t_num[None, :] * inv_det
        # both faces occlude (GL depth buffer keeps front-facing only,
        # but probes never start inside walls, so this only tightens)
        hit = (
            (jnp.abs(det) > 1e-12)
            & (u_num * jnp.sign(det) >= 0.0)
            & (v_num * jnp.sign(det) >= 0.0)
            & ((u_num + v_num) * jnp.sign(det) <= jnp.abs(det))
            & (t > NEAR) & (t < FAR)
            & mask[None, :]
        )
        t = jnp.where(hit, t, jnp.inf)
        return jnp.minimum(t_best, jnp.min(t, axis=1)), None

    init = jnp.full(dirs.shape[0], jnp.inf, jnp.float32)
    t_best, _ = jax.lax.scan(body, init, jnp.arange(n_chunks))
    return t_best


def visible_ents(bank, state) -> jax.Array:
    """(E,) bool: entity visible from the agent camera.

    Mirrors get_visible_ents semantics: an alive entity is visible when
    a probe point on its bounding volume is inside the view frustum and
    unoccluded by static geometry.
    """
    origin = geom.cam_position(
        state.pos, state.dir, state.cam_height, state.cam_fwd_disp
    )
    fwd, up, right = geom.cam_basis(state.dir, state.cam_pitch)
    tan_y = jnp.tan(jnp.deg2rad(state.cam_fov_y) * 0.5)
    # frustum slightly widened like the reference's box overdraw
    tan_x = tan_y * (4.0 / 3.0)

    num_e = state.ent_pos.shape[0]
    probes = []
    for off_r, off_h in _PROBE_OFFS:
        p = state.ent_pos.copy()
        p = p + off_r * state.ent_radius[:, None] * geom.yaw_right_vec(
            jnp.full((num_e,), state.dir)
        )
        p = p.at[:, 1].add(off_h * state.ent_height)
        probes.append(p)
    pts = jnp.concatenate(probes, axis=0)  # (P*E, 3)

    vec = pts - origin[None, :]
    dist = jnp.linalg.norm(vec, axis=1)
    # camera-space components
    z = vec @ fwd
    x = vec @ right
    y = vec @ up
    in_frustum = (
        (z > NEAR)
        & (jnp.abs(x) <= z * tan_x + 1e-6)
        & (jnp.abs(y) <= z * tan_y + 1e-6)
    )

    t_static = _static_hit_t(bank, state.layout_id, origin, vec)
    # unoccluded when the nearest wall along the probe is farther than
    # the probe point (vec has unit parameter length at the point)
    unoccluded = t_static > 1.0 - 1e-4
    vis = (in_frustum & unoccluded).reshape(len(_PROBE_OFFS), num_e)
    return jnp.any(vis, axis=0) & state.ent_alive
