"""Fused Pallas kernel vs the XLA raycaster (interpreter on CPU).

The kernel (render/pallas_kernel2.py) must reproduce the XLA path's
images on its supported env classes — fourier textures, dr off,
sphere/box entities — through every schedule mode: full scan
(Hallway), and packed per-room PVS (Maze). Small tolerance: the
kernel's in-chunk attribute reduction uses a different summation
order, so isolated edge/tie pixels may round differently.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from miniworld_tpu.envs import make_spec
from miniworld_tpu.vector import MiniWorldVec

W, H = 48, 36


def _compare(env_x, env_p, steps=3, frac_tol=0.01, seed=0):
    key = jax.random.key(seed)
    sx, (ox, dx) = env_x.reset(key)
    sp, (op, dp) = env_p.reset(key)
    frames = [(ox, dx, op, dp)]
    k_act = jax.random.key(seed + 1)
    for _ in range(steps):
        k_act, k = jax.random.split(k_act)
        acts = env_x.sample_actions(k)
        sx, (ox, dx), *_ = env_x.step(sx, acts)
        sp, (op, dp), *_ = env_p.step(sp, acts)
        frames.append((ox, dx, op, dp))
    for i, (ox, dx, op, dp) in enumerate(frames):
        if isinstance(ox, dict):
            ox, op = ox["obs"], op["obs"]
        rgb_x = np.asarray(ox, np.int32)
        rgb_p = np.asarray(op, np.int32)
        diff = np.abs(rgb_x - rgb_p)
        frac = float((diff > 2).mean())
        assert frac < frac_tol, (i, frac, diff.max())
        d_x, d_p = np.asarray(dx), np.asarray(dp)
        dfrac = float((np.abs(d_x - d_p) > 1e-3).mean())
        assert dfrac < frac_tol, (i, dfrac)


def test_pallas_matches_xla_fullscan():
    kw = dict(num_envs=2, obs_width=W, obs_height=H)
    env_x = MiniWorldVec("MiniWorld-Hallway-v0", **kw)
    env_p = MiniWorldVec("MiniWorld-Hallway-v0", render_backend="pallas",
                         **kw)
    assert not env_p._pvs_packed and env_p._chunk_vis is None
    _compare(env_x, env_p)


def test_pallas_matches_xla_packed_pvs():
    spec = dataclasses.replace(make_spec("MiniWorld-Maze-v0"),
                               num_layouts=2)
    kw = dict(num_envs=2, obs_width=W, obs_height=H, bank_seed=3)
    env_x = MiniWorldVec(spec, **kw)
    env_p = MiniWorldVec(spec, render_backend="pallas", **kw)
    assert env_p._pvs_packed
    _compare(env_x, env_p)


def test_pallas_entities():
    """Box + ball entities intersect analytically in the kernel."""
    kw = dict(num_envs=2, obs_width=W, obs_height=H)
    env_x = MiniWorldVec("MiniWorld-PutNext-v0", **kw)
    env_p = MiniWorldVec("MiniWorld-PutNext-v0", render_backend="pallas",
                         **kw)
    _compare(env_x, env_p, frac_tol=0.02)


def test_pallas_domain_rand():
    """Texture-variant randomization resolves in-kernel from the env's
    hash key with the exact draws of the XLA path."""
    spec = dataclasses.replace(make_spec("MiniWorld-Maze-v0"),
                               num_layouts=2)
    kw = dict(num_envs=2, obs_width=W, obs_height=H, bank_seed=3,
              domain_rand=True)
    env_x = MiniWorldVec(spec, **kw)
    env_p = MiniWorldVec(spec, render_backend="pallas", **kw)
    _compare(env_x, env_p, steps=2)


def test_pallas_mesh_entities():
    """Dynamic mesh protos (keys/duckies) render through the kernel's
    mesh-row seeding pass, matching the XLA _entity_mesh_pass."""
    kw = dict(num_envs=2, obs_width=W, obs_height=H)
    env_x = MiniWorldVec("MiniWorld-PickupObjects-v0", **kw)
    env_p = MiniWorldVec("MiniWorld-PickupObjects-v0",
                         render_backend="pallas", **kw)
    _compare(env_x, env_p, steps=2, frac_tol=0.02)


def test_pallas_glyph_gain():
    """Fourier-SDF glyph textures (Sign) evaluate identically: the
    kernel applies the same trailing-gain threshold/expansion as
    eval_fourier."""
    kw = dict(num_envs=2, obs_width=W, obs_height=H)
    env_x = MiniWorldVec("MiniWorld-Sign-v0", **kw)
    env_p = MiniWorldVec("MiniWorld-Sign-v0", render_backend="pallas",
                         **kw)
    assert env_p._tex_has_gain
    _compare(env_x, env_p, steps=2, frac_tol=0.02)


def test_pallas_frustum_culling_engages():
    """Schedule slots whose chunk AABB is outside the camera frustum
    become repeats of the previous kept slot (the kernel skips
    repeats). On a maze most PVS chunks are behind/off-axis from any
    given pose, so repeats must actually appear — this guards the
    culling machinery against silently degrading to full schedules.
    Pixel correctness of culled renders is covered by the _compare
    parity tests above."""
    spec = dataclasses.replace(make_spec("MiniWorld-Maze-v0"),
                               num_layouts=2)
    env_p = MiniWorldVec(spec, num_envs=8, obs_width=W, obs_height=H,
                         bank_seed=3, render_backend="pallas")
    assert env_p._pvs_packed
    state, _ = env_p.reset(jax.random.key(0))
    sched = np.asarray(env_p._pallas_schedules(env_p._bank, state))
    assert sched.shape == (8, env_p._sched_len)
    repeats = (sched[:, 1:] == sched[:, :-1]).mean()
    assert repeats > 0.0, sched
    # every slot stays inside the env's own packed region
    base = np.asarray(env_p._bank.pvs_room_base)
    nch = np.asarray(env_p._bank.pvs_room_nchunks)
    lids = np.asarray(state.layout_id)
    for b in range(8):
        lo = base[lids[b]].min()
        assert (sched[b] >= 0).all() and (
            sched[b] < base[lids[b]].max() + nch[lids[b]].max()
        ).all()


def test_pallas_matches_xla_chunk_vis(monkeypatch):
    """chunk_vis schedule mode (packed planner disabled): the kernel's
    sorted-and-filled schedules must render identically to the XLA
    oracle."""
    import miniworld_tpu.vector as vec

    monkeypatch.setattr(
        vec, "plan_packed_pvs",
        lambda bank_np, cap, **kw: (None, cap, None, np.inf),
    )
    spec = dataclasses.replace(make_spec("MiniWorld-Maze-v0"),
                               num_layouts=2)
    kw = dict(num_envs=2, obs_width=W, obs_height=H, bank_seed=3,
              tri_chunk=32)
    env_x = MiniWorldVec(spec, **kw)
    env_p = MiniWorldVec(spec, render_backend="pallas", **kw)
    assert env_p._chunk_vis is not None and not env_p._pvs_packed
    _compare(env_x, env_p, steps=2)


def _tile_wedge_out(pt, mn, mx, o, fwd, up, right, tan_x, tan_y,
                    width, height):
    """Host replica of the kernel's 4-plane per-tile wedge test."""
    from miniworld_tpu.render.pallas_kernel2 import TILE_H, TILE_W

    nbx = -(-width // TILE_W)
    r0, c0 = (pt // nbx) * TILE_H, (pt % nbx) * TILE_W
    ys_hi = (1.0 - 2.0 * r0 / height) * tan_y
    ys_lo = (1.0 - 2.0 * (r0 + TILE_H) / height) * tan_y
    xs_lo = (2.0 * c0 / width - 1.0) * tan_x
    xs_hi = (2.0 * (c0 + TILE_W) / width - 1.0) * tan_x
    out = False
    for n in (up - ys_lo * fwd, ys_hi * fwd - up,
              right - xs_lo * fwd, xs_hi * fwd - right):
        corner = np.where(n > 0, mx, mn)
        out |= float(n @ (corner - o)) < -1e-3
    return out


def _tile_pixels(pt, width, height):
    """Flat pixel indices a 2-D tile's 128 lanes map to (with the
    kernel's per-coordinate edge clamping)."""
    from miniworld_tpu.render.pallas_kernel2 import TILE_H, TILE_W

    nbx = -(-width // TILE_W)
    r0, c0 = (pt // nbx) * TILE_H, (pt % nbx) * TILE_W
    rows = np.minimum(np.arange(TILE_H) + r0, height - 1)
    cols = np.minimum(np.arange(TILE_W) + c0, width - 1)
    return (rows[:, None] * width + cols[None, :]).reshape(-1)


def test_pallas_tile_skip_engages():
    """The kernel's per-(chunk, 2-D pixel-tile) wedge test must
    actually fire on maze scenes (a far room's chunk projects to few
    image tiles). Replicates the kernel's scalar predicate on the host
    and requires both skipped and kept tiles; pixel correctness of
    skipping is covered by the _compare parity tests."""
    from miniworld_tpu.ops import geom
    from miniworld_tpu.render.pallas_kernel2 import TILE_H, TILE_W

    spec = dataclasses.replace(make_spec("MiniWorld-Maze-v0"),
                               num_layouts=2)
    # small chunks => spatially localized chunk AABBs (the production
    # shape: ~128-tri chunks against a multi-thousand-tri maze bank);
    # the default auto chunk at this toy batch covers the whole region
    # in one chunk, which nothing can skip
    env_p = MiniWorldVec(spec, num_envs=4, obs_width=W, obs_height=H,
                         bank_seed=3, render_backend="pallas",
                         tri_chunk=16)
    state, _ = env_p.reset(jax.random.key(2))
    sched = np.asarray(env_p._pallas_schedules(env_p._bank, state))
    aabb = np.asarray(env_p._bank.pallas_chunk_aabb)
    n_tiles = (-(-H // TILE_H)) * (-(-W // TILE_W))
    skips = keeps = 0
    for b in range(4):
        s = jax.tree.map(lambda x: x[b], state)
        fwd, up, right = map(
            np.asarray, geom.cam_basis(s.dir, s.cam_pitch))
        o = np.asarray(geom.cam_position(
            s.pos, s.dir, s.cam_height, s.cam_fwd_disp))
        tan_y = float(np.tan(np.deg2rad(np.asarray(s.cam_fov_y)) * 0.5))
        tan_x = tan_y * (W / H)
        lid = int(s.layout_id)
        for pt in range(n_tiles):
            for c in np.unique(sched[b]):
                out = _tile_wedge_out(
                    pt, aabb[lid, c, 0:3], aabb[lid, c, 3:6], o, fwd,
                    up, right, tan_x, tan_y, W, H)
                skips += out
                keeps += not out
    assert skips > 0 and keeps > 0, (skips, keeps)


def test_pallas_tile_skip_parity_full_res():
    """Full 80x60 render (38 pixel tiles) through the kernel with tile
    skipping vs the XLA oracle — tile-boundary coverage the 48x36
    cases can't give."""
    spec = dataclasses.replace(make_spec("MiniWorld-Maze-v0"),
                               num_layouts=2)
    kw = dict(num_envs=2, obs_width=80, obs_height=60, bank_seed=3)
    env_x = MiniWorldVec(spec, **kw)
    env_p = MiniWorldVec(spec, render_backend="pallas", **kw)
    _compare(env_x, env_p, steps=1)


def test_pallas_occlusion_skip_exact():
    """Occlusion early-out (skip a chunk once every pixel's z-carry
    beats its nearest depth) must not change a single pixel: compare
    the kernel against itself with the feature off, bit-for-bit —
    isolating it from the first-win-vs-average tie caveat of the XLA
    comparison. Small chunks + an 8x8 maze give depth-sorted rooms
    behind walls, the case the skip targets."""
    spec = dataclasses.replace(make_spec("MiniWorld-Maze-v0"),
                               num_layouts=2)
    kw = dict(num_envs=4, obs_width=W, obs_height=H, bank_seed=3,
              render_backend="pallas", tri_chunk=16)
    env_a = MiniWorldVec(spec, **kw)
    env_b = MiniWorldVec(spec, **kw)
    env_b._pallas_occlusion_skip = False
    key = jax.random.key(9)
    sa, (oa, da) = env_a.reset(key)
    sb, (ob, db) = env_b.reset(key)
    for i in range(2):
        acts = env_a.sample_actions(jax.random.key(20 + i))
        sa, (oa, da), *_ = env_a.step(sa, acts)
        sb, (ob, db), *_ = env_b.step(sb, acts)
    assert np.array_equal(np.asarray(oa), np.asarray(ob))
    assert np.array_equal(np.asarray(da), np.asarray(db))


def test_pallas_occlusion_skip_engages():
    """Simulates the kernel's per-tile occlusion state machine exactly
    (per-chunk z from the XLA _tri_pass — partition-invariant, so it
    equals the kernel's — composed by running min; per-tile carry-max
    bounds refreshed only when a tile runs, like tmax_scr) and checks
    the dmin > tile_max early-out genuinely fires on a maze, where a
    corridor's end wall occludes the PVS rooms behind it."""
    from miniworld_tpu.ops import geom
    from miniworld_tpu.render.pallas_kernel2 import TILE_H, TILE_W
    from miniworld_tpu.render.raycast import _tri_pass, camera_rays

    # production shape: 80x60 (75 tiles), fine chunks. Envs 6/7 of this
    # seed look down corridors with PVS rooms hidden behind end walls —
    # the sweep that picked them measured 15/34 occlusion tile-skips
    # (plus ~150 wedge skips) there.
    WW, HH = 80, 60
    spec = dataclasses.replace(make_spec("MiniWorld-Maze-v0"),
                               num_layouts=2)
    env_p = MiniWorldVec(spec, num_envs=8, obs_width=WW, obs_height=HH,
                         bank_seed=3, render_backend="pallas",
                         tri_chunk=16)
    state, _ = env_p.reset(jax.random.key(4))
    sched = np.asarray(env_p._pallas_schedules(env_p._bank, state))
    aabb = np.asarray(env_p._bank.pallas_chunk_aabb)
    bank = env_p._bank
    n_tiles = (-(-HH // TILE_H)) * (-(-WW // TILE_W))
    tiles = [_tile_pixels(pt, WW, HH) for pt in range(n_tiles)]
    fired = 0
    for b in (4, 6, 7):
        s = jax.tree.map(lambda x: x[b], state)
        fwd, up, right = map(
            np.asarray, geom.cam_basis(s.dir, s.cam_pitch))
        o = np.asarray(geom.cam_position(
            s.pos, s.dir, s.cam_height, s.cam_fwd_disp))
        tan_y = float(np.tan(np.deg2rad(np.asarray(s.cam_fov_y)) * 0.5))
        tan_x = tan_y * (WW / HH)
        dirs = camera_rays(s, WW, HH)
        lid = int(s.layout_id)
        t_carry = np.full(WW * HH, np.inf, np.float32)
        tmax = np.full(n_tiles, np.inf, np.float32)
        for c in range(sched.shape[1]):
            if c > 0 and sched[b, c] == sched[b, c - 1]:
                continue  # repeat slot — skipped before tile tests
            chunk = int(sched[b, c])
            mn, mx = aabb[lid, chunk, 0:3], aabb[lid, chunk, 3:6]
            dmin = float(fwd @ (np.where(fwd > 0, mn, mx) - o))
            t_c, _ = _tri_pass(
                bank.pvs_verts9, bank.pvs_attr, s.layout_id,
                jnp.asarray(o), dirs, env_p.tri_chunk,
                chunk_sched=jnp.full((1,), chunk, jnp.int32),
            )
            t_c = np.asarray(t_c)
            for pt in range(n_tiles):
                wedge_out = _tile_wedge_out(
                    pt, mn, mx, o, fwd, up, right, tan_x, tan_y, WW, HH)
                occl = dmin > tmax[pt]
                fired += occl and not wedge_out
                if wedge_out or occl:
                    continue  # tile skipped: carry and bound untouched
                pix = tiles[pt]
                t_carry[pix] = np.minimum(t_carry[pix], t_c[pix])
                tmax[pt] = t_carry[pix].max()
    assert fired > 0


def test_pallas_many_mesh_entities():
    """CollectHealth's 18 medkit mesh entities produce the largest
    mesh-row pack (multiple mesh chunks) — the heaviest exercise of
    the seeding pass's per-chunk AABB tile culling."""
    kw = dict(num_envs=2, obs_width=W, obs_height=H)
    env_x = MiniWorldVec("MiniWorld-CollectHealth-v0", **kw)
    env_p = MiniWorldVec("MiniWorld-CollectHealth-v0",
                         render_backend="pallas", **kw)
    _compare(env_x, env_p, steps=2, frac_tol=0.02)


def test_pallas_odd_obs_size():
    """Obs dims that are not TILE_H/TILE_W multiples (50x37) exercise
    the 2-D tile edge clamping and the host-side untile crop."""
    kw = dict(num_envs=2, obs_width=50, obs_height=37)
    env_x = MiniWorldVec("MiniWorld-Hallway-v0", **kw)
    env_p = MiniWorldVec("MiniWorld-Hallway-v0", render_backend="pallas",
                         **kw)
    _compare(env_x, env_p, steps=2)


def test_pallas_pitched_camera():
    """Nonzero cam_pitch tilts the frustum planes (schedule-level and
    tile-level culling both use the pitched camera basis); CameraControl
    actions drive pitch, so a few random steps cover it."""
    kw = dict(num_envs=2, obs_width=W, obs_height=H)
    env_x = MiniWorldVec("MiniWorld-CameraControl-v0", **kw)
    env_p = MiniWorldVec("MiniWorld-CameraControl-v0",
                         render_backend="pallas", **kw)
    _compare(env_x, env_p, steps=4)


def test_pallas_rejects_unsupported():
    with pytest.raises(ValueError, match="supersampl"):
        MiniWorldVec("MiniWorld-Hallway-v0", num_envs=2, obs_width=W,
                     obs_height=H, supersample=2,
                     render_backend="pallas")
