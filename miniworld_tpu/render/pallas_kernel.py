"""Fused Pallas TPU render kernel.

The XLA raycaster (render/raycast.py) is algorithmically gather-free,
but XLA materializes every (pixels x triangles) intermediate to HBM —
at 1024 envs x 4800 pixels that is gigabytes of traffic per step and
dominates the step time. This kernel runs the identical pipeline —
ray generation, chunked ray-triangle intersection with in-chunk one-hot
attribute resolve (MXU), analytic entity intersection, Fourier texture
evaluation, fixed-function shading — entirely in VMEM, gridded over
(env, pixel-tile). Per grid cell everything lives on-chip; HBM sees
only the compact inputs (triangle bank, uniforms, entity/texture
tables) and the packed RGBA+depth outputs.

Numerical semantics match render/raycast.py (same formulas, f32); the
only deliberate difference is the within-chunk tie-break: equal-t
winners are weight-normalized instead of first-index (cumsum does not
lower in Mosaic). Ties require bit-equal ray-triangle distances and are
z-fights in GL too.

Layout contracts:
  uniforms (B, 32) f32:
    [0:3] cam origin  [3:6] fwd  [6:9] up  [9:12] right
    [12] tan_x  [13] tan_y  [14:17] sky  [17:20] light_pos
    [20:23] light_color  [23:26] light_ambient
  ent_attr (B, E, 16) f32:
    [0:3] pos  [3] dir  [4:7] size  [7] height  [8:11] color
    [11] shape  [12] active
  outputs: rgba (B, PXPAD) u32 packed 0xAABBGGRR, depth (B, PXPAD) f32.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from miniworld_tpu.render.raycast import FAR, GL_GLOBAL_AMBIENT, NEAR
from miniworld_tpu.scene.entities import SHAPE_SPHERE

TILE = 512  # pixels per grid cell
TRI_CHUNK = 128


def _round_up(n, m):
    return -(-n // m) * m


def _kernel(
    # scalar prefetch
    layout_ids_ref,
    # inputs
    verts_ref,      # (1, S, 3, 3)
    attr_ref,       # (1, S, 16)
    uni_ref,        # (1, 32)
    ent_ref,        # (1, E, 16)
    coef_ref,       # (1, T, D)
    # outputs
    rgba_ref,       # (1, PT, TILE) — revisited across pixel tiles
    depth_ref,      # (1, PT, TILE)
    *,
    width: int,
    height: int,
    k_terms: int,
    num_tris: int,
    num_ents: int,
):
    pt = pl.program_id(1)

    u = uni_ref[0, 0]
    origin = u[0:3]
    fwd, up, right = u[3:6], u[6:9], u[9:12]
    tan_x, tan_y = u[12], u[13]

    # ---- ray directions for this pixel tile --------------------------
    pix = pt * TILE + jax.lax.broadcasted_iota(jnp.int32, (TILE, 1), 0)[:, 0]
    hw = width * height
    pix = jnp.minimum(pix, hw - 1)  # clamp padding pixels
    py = pix // width
    px = pix - py * width
    xs = (2.0 * (px.astype(jnp.float32) + 0.5) / width - 1.0) * tan_x
    ys = (1.0 - 2.0 * (py.astype(jnp.float32) + 0.5) / height) * tan_y
    dirs = (
        fwd[None, :]
        + xs[:, None] * right[None, :]
        + ys[:, None] * up[None, :]
    )  # (TILE, 3)

    # ---- triangle pass (chunked, one-hot resolve) ---------------------
    n_chunks = _round_up(num_tris, TRI_CHUNK) // TRI_CHUNK

    def tri_body(c, carry):
        t_best, attr_best, u_best, v_best = carry
        start = jnp.minimum(c * TRI_CHUNK, num_tris - TRI_CHUNK)
        verts = verts_ref[0, pl.ds(start, TRI_CHUNK)]  # (TC,3,3)
        attrs = attr_ref[0, pl.ds(start, TRI_CHUNK)]  # (TC,16)

        v0 = verts[:, 0]
        e1 = verts[:, 1] - v0
        e2 = verts[:, 2] - v0
        s = origin[None, :] - v0

        g_det = jnp.cross(e2, e1)
        g_u = jnp.cross(e2, s)
        g_v = jnp.cross(s, e1)
        t_num = jnp.sum(e2 * g_v, axis=-1)  # (TC,)

        det = jnp.dot(dirs, g_det.T, preferred_element_type=jnp.float32)
        u_num = jnp.dot(dirs, g_u.T, preferred_element_type=jnp.float32)
        v_num = jnp.dot(dirs, g_v.T, preferred_element_type=jnp.float32)

        inv_det = 1.0 / jnp.where(det > 1e-12, det, 1.0)
        t = t_num[None, :] * inv_det
        hit = (
            (det > 1e-12)
            & (u_num >= 0.0)
            & (v_num >= 0.0)
            & (u_num + v_num <= det)
            & (t > NEAR)
            & (t < FAR)
        )
        t = jnp.where(hit, t, jnp.inf)
        t_min = jnp.min(t, axis=1)
        oh = ((t == t_min[:, None]) & hit).astype(jnp.float32)
        # weight-normalize exact ties (see module docstring)
        oh = oh / jnp.maximum(jnp.sum(oh, axis=1, keepdims=True), 1.0)
        sel = jnp.dot(oh, attrs, preferred_element_type=jnp.float32)
        u_sel = jnp.sum(oh * (u_num * inv_det), axis=1)
        v_sel = jnp.sum(oh * (v_num * inv_det), axis=1)

        closer = t_min < t_best
        return (
            jnp.where(closer, t_min, t_best),
            jnp.where(closer[:, None], sel, attr_best),
            jnp.where(closer, u_sel, u_best),
            jnp.where(closer, v_sel, v_best),
        )

    t_tri, attr, u_bar, v_bar = jax.lax.fori_loop(
        0, n_chunks, tri_body,
        (
            jnp.full((TILE,), jnp.inf, jnp.float32),
            jnp.zeros((TILE, 16), jnp.float32),
            jnp.zeros((TILE,), jnp.float32),
            jnp.zeros((TILE,), jnp.float32),
        ),
    )

    # ---- entity pass ----------------------------------------------------
    def ent_body(e, carry):
        t_best, col_best, n_best = carry
        row = ent_ref[0, e]
        pos = row[0:3]
        direction = row[3]
        size = row[4:7]
        eheight = row[7]
        color = row[8:11]
        shape = row[11]
        active = row[12] > 0.5

        # sphere
        center = jnp.stack([pos[0], pos[1] + 0.5 * eheight, pos[2]])
        r_vis = 0.5 * eheight
        oc = origin - center
        a = jnp.sum(dirs * dirs, axis=1)
        b = 2.0 * jnp.sum(dirs * oc[None, :], axis=1)
        cc = jnp.sum(oc * oc) - r_vis * r_vis
        disc = b * b - 4.0 * a * cc
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        t_sph = (-b - sq) / (2.0 * a)
        sph_hit = (disc > 0.0) & (t_sph > NEAR) & (t_sph < FAR)
        p_sph = origin[None, :] + t_sph[:, None] * dirs
        n_sph = (p_sph - center[None, :]) / r_vis

        # oriented box
        cd, sd = jnp.cos(direction), jnp.sin(direction)
        zero = 0.0 * cd
        ax_x = jnp.stack([cd, zero, -sd])
        ax_y = jnp.stack([zero, zero + 1.0, zero])
        ax_z = jnp.stack([sd, zero, cd])
        o_rel = origin - pos
        o_l = jnp.stack([
            jnp.sum(o_rel * ax_x), jnp.sum(o_rel * ax_y), jnp.sum(o_rel * ax_z)
        ])
        d_l = jnp.stack(
            [
                jnp.sum(dirs * ax_x[None, :], axis=1),
                jnp.sum(dirs * ax_y[None, :], axis=1),
                jnp.sum(dirs * ax_z[None, :], axis=1),
            ],
            axis=1,
        )  # (TILE,3)
        lo = jnp.stack([-size[0] * 0.5, 0.0, -size[2] * 0.5])
        hi = jnp.stack([size[0] * 0.5, size[1], size[2] * 0.5])
        safe_d = jnp.where(jnp.abs(d_l) < 1e-9, 1e-9, d_l)
        t1 = (lo[None, :] - o_l[None, :]) / safe_d
        t2 = (hi[None, :] - o_l[None, :]) / safe_d
        t_lo = jnp.minimum(t1, t2)
        t_hi = jnp.maximum(t1, t2)
        t_in = jnp.max(t_lo, axis=1)
        t_out = jnp.min(t_hi, axis=1)
        box_hit = (t_in <= t_out) & (t_in > NEAR) & (t_in < FAR)
        slab_oh = (t_lo == t_in[:, None]).astype(jnp.float32)
        slab_oh = slab_oh / jnp.maximum(jnp.sum(slab_oh, axis=1, keepdims=True), 1.0)
        sign = -jnp.sign(jnp.sum(slab_oh * d_l, axis=1))
        n_box = sign[:, None] * (
            slab_oh[:, 0:1] * ax_x[None, :]
            + slab_oh[:, 1:2] * ax_y[None, :]
            + slab_oh[:, 2:3] * ax_z[None, :]
        )

        is_sphere = shape == float(SHAPE_SPHERE)
        t_e = jnp.where(is_sphere, t_sph, t_in)
        hit_e = active & jnp.where(is_sphere, sph_hit, box_hit)
        n_e = jnp.where(is_sphere, n_sph, n_box)

        closer = hit_e & (t_e < t_best)
        return (
            jnp.where(closer, t_e, t_best),
            jnp.where(closer[:, None], color[None, :], col_best),
            jnp.where(closer[:, None], n_e, n_best),
        )

    t_ent, col_ent, n_ent = jax.lax.fori_loop(
        0, num_ents, ent_body,
        (
            jnp.full((TILE,), jnp.inf, jnp.float32),
            jnp.zeros((TILE, 3), jnp.float32),
            jnp.zeros((TILE, 3), jnp.float32),
        ),
    )

    # ---- texture (Fourier) ----------------------------------------------
    uv = attr[:, 0:2] + u_bar[:, None] * attr[:, 2:4] + v_bar[:, None] * attr[:, 4:6]
    slot = jnp.round(attr[:, 12]).astype(jnp.int32)
    n_slots = coef_ref.shape[1]
    oh_slot = (
        slot[:, None] == jax.lax.broadcasted_iota(jnp.int32, (TILE, n_slots), 1)
    ).astype(jnp.float32)
    ce = jnp.dot(oh_slot, coef_ref[0], preferred_element_type=jnp.float32)
    k = k_terms
    dc = ce[:, 0:3]
    fu = ce[:, 3:3 + k]
    fv = ce[:, 3 + k:3 + 2 * k]
    a0 = 3 + 2 * k
    arg = (2.0 * math.pi) * (fu * uv[:, 0:1] + fv * uv[:, 1:2])
    ca, sa = jnp.cos(arg), jnp.sin(arg)
    tex_r = dc[:, 0] + jnp.sum(ce[:, a0:a0 + k] * ca + ce[:, a0 + 3 * k:a0 + 4 * k] * sa, axis=1)
    tex_g = dc[:, 1] + jnp.sum(ce[:, a0 + k:a0 + 2 * k] * ca + ce[:, a0 + 4 * k:a0 + 5 * k] * sa, axis=1)
    tex_b = dc[:, 2] + jnp.sum(ce[:, a0 + 2 * k:a0 + 3 * k] * ca + ce[:, a0 + 5 * k:a0 + 6 * k] * sa, axis=1)
    texel = jnp.stack([tex_r, tex_g, tex_b], axis=1)
    texel = jnp.clip(texel, 0.0, 1.0)
    texel = jnp.where((slot >= 0)[:, None], texel, 1.0)

    tri_color = attr[:, 9:12] * texel
    tri_normal = attr[:, 6:9]

    # ---- merge + shade ---------------------------------------------------
    ent_wins = t_ent < t_tri
    t_hit = jnp.where(ent_wins, t_ent, t_tri)
    color = jnp.where(ent_wins[:, None], col_ent, tri_color)
    normal = jnp.where(ent_wins[:, None], n_ent, tri_normal)

    hit = t_hit < jnp.inf
    t_safe = jnp.where(hit, t_hit, FAR)
    hit_p = origin[None, :] + t_safe[:, None] * dirs
    l_vec = u[17:20][None, :] - hit_p
    l_norm = jax.lax.rsqrt(jnp.maximum(jnp.sum(l_vec * l_vec, axis=1), 1e-18))
    ndotl = jnp.maximum(jnp.sum(normal * l_vec, axis=1) * l_norm, 0.0)
    lit = (
        GL_GLOBAL_AMBIENT
        + u[23:26][None, :]
        + u[20:23][None, :] * ndotl[:, None]
    )
    shaded = color * jnp.clip(lit, 0.0, 1.0)
    rgb = jnp.where(hit[:, None], shaded, u[14:17][None, :])
    rgb8 = jnp.clip(rgb * 255.0, 0.0, 255.0).astype(jnp.int32).astype(jnp.uint32)

    rgba_ref[0, pt] = (
        rgb8[:, 0] | (rgb8[:, 1] << 8) | (rgb8[:, 2] << 16)
        | jnp.uint32(0xFF000000)
    )
    depth_ref[0, pt] = t_safe


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "k_terms"),
)
def render_batch_pallas(
    layout_ids,  # (B,) i32
    tri_verts,   # (L, S, 3, 3) f32
    tri_attr,    # (L, S, 16) f32
    uniforms,    # (B, 32) f32
    ent_attr,    # (B, E, 16) f32
    coeffs,      # (B, T, D) f32
    *,
    width: int,
    height: int,
    k_terms: int,
):
    """Render B envs. Returns rgb (B,H,W,3) u8 and depth (B,H,W,1) f32."""
    b = layout_ids.shape[0]
    s = tri_verts.shape[1]
    e = ent_attr.shape[1]
    hw = width * height
    pxpad = _round_up(hw, TILE)
    n_tiles = pxpad // TILE

    kernel = functools.partial(
        _kernel,
        width=width, height=height, k_terms=k_terms,
        num_tris=s, num_ents=e,
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec(
                (1, s, 3, 3), lambda bi, ti, lids: (lids[bi], 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, s, 16), lambda bi, ti, lids: (lids[bi], 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, 32), lambda bi, ti, lids: (bi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, ent_attr.shape[1], 16), lambda bi, ti, lids: (bi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, coeffs.shape[1], coeffs.shape[2]),
                lambda bi, ti, lids: (bi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec((1, n_tiles, TILE), lambda bi, ti, lids: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_tiles, TILE), lambda bi, ti, lids: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )

    rgba, depth = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, n_tiles, TILE), jnp.uint32),
            jax.ShapeDtypeStruct((b, n_tiles, TILE), jnp.float32),
        ],
    )(layout_ids, tri_verts, tri_attr, uniforms, ent_attr, coeffs)

    rgba = rgba.reshape(b, pxpad)[:, :hw]
    depth = depth.reshape(b, pxpad)[:, :hw]
    rgb = jnp.stack(
        [
            (rgba & 0xFF).astype(jnp.uint8),
            ((rgba >> 8) & 0xFF).astype(jnp.uint8),
            ((rgba >> 16) & 0xFF).astype(jnp.uint8),
        ],
        axis=-1,
    ).reshape(b, height, width, 3)
    return rgb, depth.reshape(b, height, width, 1)
