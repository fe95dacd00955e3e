"""get_visible_ents oracle tests.

The query's semantics (miniworld/miniworld.py:1576-1670): render the
ROOMS into a depth buffer, then depth-test a 0.2 m box at each
entity's base position (GL_ANY_SAMPLES_PASSED). visible_ents
transcribes that per pixel; here it is checked two ways across ~100
random scenes/poses:

1. against an independent float64 numpy ray tracer of the exact same
   query (zero disagreements outside razor-thin f32 margins);
2. against per-entity pixel coverage from the raycaster's own
   z-buffer: whenever the GL QUERY BOX is beaten by no static
   geometry at some pixel, the query must answer visible. Cases where
   the box margin is sub-pixel are excluded (GL's 8x MSAA vs our
   1 spp — a sliver between pixel centers).
"""

import math

import jax
import numpy as np
import pytest

from miniworld_tpu import MiniWorldVec

W, H = 48, 36
B = 8

ENVS = [
    "MiniWorld-OneRoom-v0",
    "MiniWorld-PutNext-v0",
    "MiniWorld-PickupObjects-v0",
    "MiniWorld-GreenKey-v0",
]


def _rays_np(pos, yaw, pitch_deg, cam_height, cam_fwd_disp, fov_y):
    """float64 transcription of camera_rays + cam_position."""
    p = math.radians(pitch_deg)
    cp, sp = math.cos(p), math.sin(p)
    cy, sy = math.cos(yaw), math.sin(yaw)
    fwd = np.array([cp * cy, sp, -cp * sy])
    up = np.array([-sp * cy, cp, sp * sy])
    right = np.cross(fwd, up)
    origin = np.asarray(pos, np.float64) + np.array(
        [math.cos(yaw), 0.0, -math.sin(yaw)]
    ) * cam_fwd_disp + np.array([0.0, cam_height, 0.0])
    tan_y = math.tan(math.radians(fov_y) * 0.5)
    tan_x = tan_y * (W / H)
    xs = (2.0 * (np.arange(W) + 0.5) / W - 1.0) * tan_x
    ys = (1.0 - 2.0 * (np.arange(H) + 0.5) / H) * tan_y
    d = (fwd[None, None] + xs[None, :, None] * right[None, None]
         + ys[:, None, None] * up[None, None])
    return origin, d.reshape(-1, 3)


def _room_depth_np(bank, li, origin, dirs):
    """Front-face nearest room-prim hit per ray, float64."""
    sel = bank.tri_mask[li] & bank.tri_is_room[li]
    verts = bank.tri_verts[li][sel].astype(np.float64)
    kind = bank.tri_attr[li][sel][:, 15].astype(np.float64)
    v0, e1, e2 = verts[:, 0], verts[:, 1] - verts[:, 0], verts[:, 2] - verts[:, 0]
    s = origin[None] - v0
    g_det = np.cross(e2, e1)
    g_u = np.cross(e2, s)
    g_v = np.cross(s, e1)
    t_num = np.sum(e2 * g_v, axis=-1)
    det = dirs @ g_det.T
    u_num = dirs @ g_u.T
    v_num = dirs @ g_v.T
    with np.errstate(divide="ignore", invalid="ignore"):
        t = t_num[None] / det
    # kind-blended coverage: tri prims u + v <= det, parallelogram
    # prims max(u, v) <= det (raycast._tri_pass)
    cov = np.maximum(u_num, v_num) + kind[None] * np.minimum(u_num, v_num)
    hit = ((det > 1e-12) & (u_num >= 0) & (v_num >= 0)
           & (cov <= det) & (t > 0.04) & (t < 100.0))
    t = np.where(hit, t, np.inf)
    return t.min(axis=1)


def _box_t_np(origin, dirs, pos):
    lo = np.asarray(pos, np.float64) + [-0.1, 0.0, -0.1]
    hi = np.asarray(pos, np.float64) + [0.1, 0.2, 0.1]
    safe = np.where(np.abs(dirs) < 1e-12, 1e-12, dirs)
    t1 = (lo[None] - origin[None]) / safe
    t2 = (hi[None] - origin[None]) / safe
    t_in = np.minimum(t1, t2).max(axis=1)
    t_out = np.maximum(t1, t2).min(axis=1)
    ok = (t_in <= t_out) & (t_in > 0.04) & (t_in < 100.0)
    return np.where(ok, t_in, np.inf)


@pytest.mark.parametrize("env_id", ENVS)
def test_visible_ents_oracle(env_id):
    env = MiniWorldVec(env_id, num_envs=B, obs_width=W, obs_height=H)
    bank = env._bank_np
    checked = disagreed = 0
    for seed in (0, 1, 2):
        state, _ = env.reset(jax.random.key(seed))
        got = np.asarray(env.visible_ents(state))
        for b in range(B):
            li = int(state.layout_id[b])
            origin, dirs = _rays_np(
                np.asarray(state.pos[b]), float(state.dir[b]),
                float(state.cam_pitch[b]), float(state.cam_height[b]),
                float(state.cam_fwd_disp[b]), float(state.cam_fov_y[b]),
            )
            d_room = _room_depth_np(bank, li, origin, dirs)
            for e in range(state.ent_pos.shape[1]):
                if not bool(state.ent_alive[b, e]):
                    assert not got[b, e]
                    continue
                t_box = _box_t_np(origin, dirs, np.asarray(state.ent_pos[b, e]))
                with np.errstate(invalid="ignore"):
                    margin = d_room - t_box  # >0 where the box passes
                finite = np.isfinite(margin)
                want = bool((margin > 0)[finite].any()) if finite.any() else False
                best = float(np.nanmax(np.where(finite, margin, -np.inf))) \
                    if finite.any() else -np.inf
                checked += 1
                # skip razor-thin f32-vs-f64 edges
                if abs(best) < 1e-3:
                    continue
                if bool(got[b, e]) != want:
                    disagreed += 1
    # >= 24 cases per env id; > 100 poses checked across the suite
    assert checked >= 24, checked
    assert disagreed == 0, (env_id, disagreed, checked)


def test_box_query_semantics_vs_entity_pixels():
    """GL-conservatism contract vs the raycaster's own z-buffer: if the
    QUERY BOX owns a pixel in front of all room geometry, the query
    answers visible — and rendering the scene with only that entity
    alive shows the entity beating static depth wherever its geometry
    is in front (the reference renders real geometry but QUERIES the
    base box; an entity whose base box is hidden can legitimately
    answer invisible while its top is on screen, and the test
    documents that known GL behavior rather than 'fixing' it)."""
    import jax.numpy as jnp

    env = MiniWorldVec("MiniWorld-OneRoom-v0", num_envs=B,
                       obs_width=W, obs_height=H)
    asserted = 0
    # enough fixed seeds that >= 4 poses qualify under any reset-rng
    # scheme (the round-5 counter-based reset draws shifted which
    # seeds produce close-up entities)
    for seed in range(4, 16):
        state, _ = env.reset(jax.random.key(seed))
        got = np.asarray(env.visible_ents(state))
        # render depth with the entity removed vs present
        dead = state.replace(ent_alive=jnp.zeros_like(state.ent_alive))
        _, d_none = env._render_jit(env._bank, env._atlas, dead)
        _, d_all = env._render_jit(env._bank, env._atlas, state)
        ent_pixels = (
            np.asarray(d_all) < np.asarray(d_none) - 1e-4
        ).reshape(B, -1)
        asserted += _assert_box_visible(env, state, got, ent_pixels)
    assert asserted >= 4, asserted  # deterministic seeds: 4 qualifying poses


def _assert_box_visible(env, state, got, ent_pixels):
    asserted = 0
    for b in range(B):
        origin, dirs = _rays_np(
            np.asarray(state.pos[b]), float(state.dir[b]),
            float(state.cam_pitch[b]), float(state.cam_height[b]),
            float(state.cam_fwd_disp[b]), float(state.cam_fov_y[b]),
        )
        d_room = _room_depth_np(env._bank_np, int(state.layout_id[b]),
                                origin, dirs)
        t_box = _box_t_np(origin, dirs, np.asarray(state.ent_pos[b, 0]))
        box_pixels = int((t_box < d_room).sum())
        # whenever the entity shows real pixels AND its base query box
        # is at least a couple of pixels wide, the query answers
        # visible (a sub-pixel box can fall between 1-spp ray centers —
        # the same flakiness GL has at 8 samples)
        if ent_pixels[b].sum() > 4 and box_pixels > 2:
            assert got[b, 0], b
            asserted += 1
    return asserted
