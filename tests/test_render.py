"""Renderer correctness: Fourier texture model, depth math, texture-mode
consistency, top view. The reference asserts rendering only
statistically (tests/test_miniworld.py:30-33); we do the same plus
analytic depth checks the GL path can't do."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from miniworld_tpu import MiniWorldVec
from miniworld_tpu.render.textures import (
    TextureCatalog,
    fit_fourier_texture,
)
from miniworld_tpu.render import raycast
from miniworld_tpu.utils.assets import texture_variant_paths

W, H = 48, 36


def _reconstruct(packed, k, res):
    """Evaluate the packed Fourier model on a res x res grid (numpy)."""
    dc = packed[0:3]
    fu = packed[3:3 + k]
    fv = packed[3 + k:3 + 2 * k]
    a0 = 3 + 2 * k
    a = packed[a0:a0 + 3 * k].reshape(3, k)
    b = packed[a0 + 3 * k:a0 + 6 * k].reshape(3, k)
    # evaluate on the DFT grid (texel corners), matching the fit basis
    u = np.arange(res) / res
    v = 1.0 - np.arange(res) / res
    uu, vv = np.meshgrid(u, v, indexing="xy")  # row = image row (top-down)
    arg = 2 * np.pi * (fu[None, None, :] * uu[..., None]
                       + fv[None, None, :] * vv[..., None])
    ca, sa = np.cos(arg), np.sin(arg)
    out = np.empty((res, res, 3))
    for ch in range(3):
        out[..., ch] = dc[ch] + (a[ch] * ca + b[ch] * sa).sum(-1)
    return out


def test_cos_sin_turns_accuracy():
    """The turn-wrapped polynomial cos/sin (raycast._cos_sin_turns)
    matches the transcendental truth 16x below u8 texel quantization
    over the full phase range the texture model produces."""
    phi = jnp.asarray(np.random.default_rng(0).uniform(-300, 300, 20000),
                      jnp.float32)
    c, s = raycast._cos_sin_turns(phi)
    truth_c = np.cos(2 * np.pi * np.asarray(phi, np.float64))
    truth_s = np.sin(2 * np.pi * np.asarray(phi, np.float64))
    # f32 phase resolution at |phi|~300 costs ~2e-4 by itself; the
    # poly adds 1.2e-4
    assert float(np.abs(np.asarray(c) - truth_c).max()) < 5e-4
    assert float(np.abs(np.asarray(s) - truth_s).max()) < 5e-4


def test_fourier_fit_reconstruction():
    """Packed-coefficient evaluation must reproduce the fit: RMSE below
    an 8x8 mip for structured textures (the GL-minified look)."""
    from PIL import Image

    for name in ["brick_wall", "floor_tiles_bw", "concrete_tiles"]:
        path = texture_variant_paths(name)[0]
        with Image.open(path) as im:
            img = np.asarray(
                im.convert("RGB").resize((64, 64), Image.BILINEAR)
            ).astype(np.float64) / 255.0
        k = 32
        packed = fit_fourier_texture(img, k)
        rec = _reconstruct(packed, k, 64)
        rmse = float(np.sqrt(np.mean((rec - img) ** 2)))
        mip = np.asarray(
            Image.fromarray((img * 255).astype(np.uint8))
            .resize((8, 8), Image.BILINEAR)
            .resize((64, 64), Image.BILINEAR)
        ).astype(np.float64) / 255.0
        mip_rmse = float(np.sqrt(np.mean((mip - img) ** 2)))
        assert rmse < mip_rmse, (name, rmse, mip_rmse)
        assert rmse < 0.08, (name, rmse)


def test_fourier_periodicity():
    """GL_REPEAT: shifting uv by integers must not change the texel."""
    from PIL import Image

    path = texture_variant_paths("brick_wall")[0]
    with Image.open(path) as im:
        img = np.asarray(im.convert("RGB").resize((64, 64))).astype(float) / 255
    packed = jnp.asarray(fit_fourier_texture(img, 16))[None, :]
    uv = jnp.array([[0.3, 0.7], [0.3 + 5.0, 0.7 - 3.0]])
    slot = jnp.zeros(2, jnp.float32)
    texel = raycast.eval_fourier(packed, slot, uv, 16)
    np.testing.assert_allclose(
        np.asarray(texel[0]), np.asarray(texel[1]), atol=2e-4
    )


def test_depth_is_eye_space_z():
    """Agent facing a wall squarely: center-pixel depth equals the
    perpendicular wall distance (opengl.py:400-435 semantics)."""
    env = MiniWorldVec("MiniWorld-OneRoom-v0", num_envs=1, obs_width=W,
                       obs_height=H)
    state, _ = env.reset(jax.random.key(0))
    # put the agent at the center looking +x at the x=10 wall
    state = jax.tree.map(lambda x: x, state)
    state = state.replace(
        pos=jnp.array([[5.0, 0.0, 5.0]]),
        dir=jnp.array([0.0]),
        cam_pitch=jnp.array([0.0]),
        ent_alive=jnp.zeros_like(state.ent_alive),
    )
    obs, depth = env._render_jit(env._bank, env._atlas, state)
    d_center = float(depth[0, H // 2, W // 2, 0])
    # wall at x=10, eye at x=5 (+cam_fwd_disp 0) -> 5 meters
    assert abs(d_center - 5.0) < 0.05, d_center
    # sky not visible in a closed room: all depths < FAR
    assert float(depth.max()) < raycast.FAR


def test_texture_modes_agree_statistically():
    """Fourier and exact-nearest texturing must produce images that
    agree in the mean (blur differs, brightness must not)."""
    e1 = MiniWorldVec("MiniWorld-Hallway-v0", num_envs=2, obs_width=W,
                      obs_height=H, tex_mode="fourier")
    e2 = MiniWorldVec("MiniWorld-Hallway-v0", num_envs=2, obs_width=W,
                      obs_height=H, tex_mode="nearest")
    s1, (o1, _) = e1.reset(jax.random.key(0))
    s2, (o2, _) = e2.reset(jax.random.key(0))
    m1 = float(jnp.mean(o1.astype(jnp.float32)))
    m2 = float(jnp.mean(o2.astype(jnp.float32)))
    assert abs(m1 - m2) < 12.0, (m1, m2)
    # per-pixel: most pixels close (same geometry, same lighting)
    diff = np.abs(np.asarray(o1, np.int32) - np.asarray(o2, np.int32))
    assert float(np.median(diff)) < 25.0


def test_per_room_texture_variants():
    """Texture-variant randomization is per (room, role) slot like the
    reference's per-room Texture.get (miniworld.py:296-298): each slot
    draws independently, every tri of a slot shares its draw, and the
    per-tri resolution agrees with the slot table."""
    from miniworld_tpu.render.raycast import hash01

    env = MiniWorldVec("FourRooms", num_envs=4, obs_width=W, obs_height=H,
                       domain_rand=True)
    state, _ = env.reset(jax.random.key(3))
    bank = env._bank
    tt = np.asarray(bank.tri_tex[0])
    counts = np.asarray(bank.tex_slot_count[0])
    for e in range(4):
        tm = np.asarray(state.tex_map[e])
        # materialize the render scan's chunk-wise per-tri resolution
        # (raycast._tri_pass read_chunk) for the whole bank
        key = state.tri_slots[e]
        cnt = np.asarray(bank.tri_tex_count[0])
        tri_base = np.asarray(bank.tri_tex_base[0])
        u_t = np.asarray(hash01(key, jnp.asarray(tt)))
        offs = np.minimum(np.floor(u_t * cnt), cnt - 1.0)
        ts = np.where(tri_base >= 0.0, tri_base + offs, -1.0)
        valid = tt >= 0
        # per-tri resolution == slot-table resolution
        assert np.array_equal(
            ts[valid], tm[tt[valid]].astype(np.float32)
        )
        # draws stay inside each slot's variant range
        base = np.asarray(bank.tex_slot_base[0])
        offs = tm - base
        assert np.all((offs >= 0) & (offs < np.maximum(counts, 1)))
    # independence: slots of multi-variant textures must not all agree
    # in every env (4 rooms x 3 roles x 4 envs of >=2-variant slots)
    multi = counts > 1
    if multi.sum() >= 2:
        draws = np.stack(
            [np.asarray(state.tex_map[e])[multi] for e in range(4)]
        ) - np.asarray(bank.tex_slot_base[0])[multi]
        assert len(np.unique(draws)) > 1, draws


def test_top_view_shows_agent():
    from miniworld_tpu.gym_env import MiniWorldGym

    env = MiniWorldGym("OneRoom", obs_width=W, obs_height=H)
    env.reset(seed=0)
    tv = env.render_top_view(96, 96)
    assert tv.shape == (96, 96, 3)
    # red agent triangle: some pixels are pure-ish red
    red = (tv[:, :, 0] > 200) & (tv[:, :, 1] < 80) & (tv[:, :, 2] < 80)
    assert red.sum() >= 1


def test_sky_visible_outdoors():
    env = MiniWorldVec("MiniWorld-WallGap-v0", num_envs=1, obs_width=W,
                       obs_height=H)
    state, (obs, depth) = env.reset(jax.random.key(2))
    state = state.replace(cam_pitch=jnp.array([45.0]))
    obs, depth = env._render_jit(env._bank, env._atlas, state)
    # looking up outdoors: some sky pixels at FAR depth
    assert float(depth.max()) == raycast.FAR


def test_supersample_edge_quality():
    """2x2 supersampling produces intermediate (blended) intensities on
    geometric edges that 1 spp cannot: count pixels whose value sits
    strictly between local extremes along the box silhouette. The AA
    frame must also stay close to the 1-spp frame globally (same scene,
    same camera)."""
    import jax
    import numpy as np

    from miniworld_tpu import MiniWorldVec

    kw = dict(num_envs=1, obs_width=64, obs_height=48, bank_seed=0)
    env1 = MiniWorldVec("MiniWorld-Hallway-v0", **kw)
    env2 = MiniWorldVec("MiniWorld-Hallway-v0", supersample=2, **kw)
    state, (rgb1, _) = env1.reset(jax.random.key(5))
    _, (rgb2, _) = env2.reset(jax.random.key(5))
    a = np.asarray(rgb1[0]).astype(np.int32)
    b = np.asarray(rgb2[0]).astype(np.int32)
    # same scene
    assert abs(a.mean() - b.mean()) < 8.0
    # edge blending: 2x2-downsampled pixels take values strictly between
    # their neighbors' extremes much more often than the 1-spp render
    def blended_frac(img):
        g = img.mean(axis=2)
        lo = np.minimum(g[:-2, 1:-1], g[2:, 1:-1])
        hi = np.maximum(g[:-2, 1:-1], g[2:, 1:-1])
        mid = g[1:-1, 1:-1]
        strict = (mid > lo + 2) & (mid < hi - 2) & (hi - lo > 20)
        return strict.mean()
    assert blended_frac(b) > blended_frac(a) * 1.2 + 1e-4, (
        blended_frac(a), blended_frac(b)
    )


def test_glyph_sdf_mode_flag():
    """Char-glyph textures (chars/ set) are fitted as Fourier signed
    distance fields (negative trailing coefficient = SDF mode); every
    other texture stays a direct fit (thresholding a checkerboard
    floor would re-introduce AA shimmer)."""
    import numpy as np

    from miniworld_tpu.render.textures import TextureCatalog
    from miniworld_tpu.utils.assets import texture_variant_paths

    cat = TextureCatalog()
    glyph_idx = cat.add_path(texture_variant_paths("chars/ch_0x52")[0])
    floor_idx = cat.add_path(texture_variant_paths("floor_tiles_bw")[0])
    table = cat.build_fourier()
    assert table[glyph_idx, -1] < 0.0
    assert table[floor_idx, -1] == 1.0


def test_glyph_legibility_native_scale():
    """Quantitative legibility at Sign's NATIVE on-screen glyph size.

    Sign's TextFrame shows BLUE/RED/GREEN (reference envs/sign.py:158)
    on a height-1 frame ~3-5 m from typical agent poses; at the 80x60
    default obs a character covers roughly 8-16 pixels. Each glyph the
    env can show is reconstructed through the production texture path
    (Fourier-SDF at Sign's K=64, with the frequency-space AA footprint
    a real pixel of that size would carry) on an s x s grid, and must
    (a) correlate with its own box-downsampled ground truth and
    (b) be CLASSIFIED correctly against every other glyph in the set —
    correlation-argmax over the alphabet, the operational meaning of
    'legible'."""
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from miniworld_tpu.render import raycast
    from miniworld_tpu.render.textures import ATLAS_RES, TextureCatalog
    from miniworld_tpu.utils.assets import texture_variant_paths

    K = 64  # Sign's EnvSpec.fourier_k (envs/interact.py)
    chars = sorted(set("BLUEREDGREEN"))
    cat = TextureCatalog()
    paths = {}
    for ch in chars:
        # the reference names glyphs ch_0x<DECIMAL ord> (entity.py quirk)
        paths[ch] = texture_variant_paths(f"chars/ch_0x{ord(ch)}")[0]
        cat.add_path(paths[ch])
    table = jnp.asarray(cat.build_fourier(K))

    def render_at(idx, s):
        uu, vv = np.meshgrid((np.arange(s) + 0.5) / s,
                             (np.arange(s) + 0.5) / s, indexing="xy")
        uv = jnp.asarray(np.stack([uu.ravel(), vv.ravel()], axis=1),
                         jnp.float32)
        texel = np.asarray(raycast.eval_fourier(
            table, jnp.full(s * s, float(idx), jnp.float32), uv,
            k_terms=K, footprint=jnp.full(s * s, 1.0 / s, jnp.float32),
        ))
        return texel.mean(axis=1).reshape(s, s)[::-1]  # v-up -> rows

    def truth_at(ch, s):
        img = np.asarray(Image.open(paths[ch]).convert("L").resize(
            (s, s), Image.BOX), np.float32) / 255.0
        return img

    def ncc(a, b):
        a = a - a.mean()
        b = b - b.mean()
        den = np.sqrt((a * a).sum() * (b * b).sum())
        return float((a * b).sum() / max(den, 1e-9))

    # every glyph self-correlates > 0.85 and classifies perfectly at
    # 8/12/16 px (8 px = the far end of Sign's viewing range) after
    # the footprint-scaled SDF width with the swept 0.55 factor
    # (raycast.eval_fourier; 0.5 left one 8 px E misread as R)
    for s, min_diag, min_cls in ((8, 0.85, 8), (12, 0.85, 8), (16, 0.85, 8)):
        rendered = {ch: render_at(i, s) for i, ch in enumerate(chars)}
        truths = {ch: truth_at(ch, s) for ch in chars}
        classified = 0
        for ch in chars:
            corrs = {c2: ncc(rendered[ch], truths[c2]) for c2 in chars}
            assert corrs[ch] >= min_diag, (s, ch, corrs[ch])
            classified += max(corrs, key=corrs.get) == ch
        assert classified >= min_cls, (s, classified)


def test_glyph_sdf_legibility():
    """The SDF glyph reconstruction at the Sign env's K=64 classifies
    ink-vs-background well despite the 2-texel stroke dilation: total
    misclassification under 6% of texels (the round-2 direct-fit
    contrast gain measured ~5.8% at K=32 while rendering illegible
    ringing blobs; the SDF's errors are a uniform stroke thickening,
    not structure loss — verified visually, docs/images/sign_sdf.png)."""
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from miniworld_tpu.render import raycast
    from miniworld_tpu.render.textures import ATLAS_RES, TextureCatalog

    FOURIER_TERMS = 64  # Sign's EnvSpec.fourier_k
    from miniworld_tpu.utils.assets import texture_variant_paths

    cat = TextureCatalog()
    path = texture_variant_paths("chars/ch_0x52")[0]
    cat.add_path(path)
    table = jnp.asarray(cat.build_fourier(FOURIER_TERMS))

    n = 128
    uu, vv = np.meshgrid(
        (np.arange(n) + 0.5) / n, (np.arange(n) + 0.5) / n, indexing="xy"
    )
    uv = jnp.asarray(
        np.stack([uu.ravel(), vv.ravel()], axis=1), jnp.float32
    )
    texel = np.asarray(raycast.eval_fourier(
        table, jnp.zeros(n * n, jnp.float32), uv, k_terms=FOURIER_TERMS
    ))
    got_ink = texel.mean(axis=1).reshape(n, n) < 0.5

    img = np.asarray(
        Image.open(path).convert("L").resize(
            (ATLAS_RES, ATLAS_RES), Image.LANCZOS
        ),
        dtype=np.float32,
    ) / 255.0
    # uv -> image coords: u = col/R, v = 1 - row/R (GL bottom-up)
    rows = np.clip(((1.0 - vv) * ATLAS_RES).astype(int), 0, ATLAS_RES - 1)
    cols = np.clip((uu * ATLAS_RES).astype(int), 0, ATLAS_RES - 1)
    want_ink = img[rows, cols] < 0.5

    misclass = (got_ink != want_ink).mean()
    assert misclass < 0.06, misclass
    # ...and no structure loss: at least 85% of true ink texels stay
    # ink (the K=32 direct fit dropped whole strokes)
    recall = (got_ink & want_ink).sum() / max(want_ink.sum(), 1)
    assert recall > 0.85, recall


def test_mesh_entities_render():
    """Dynamic mesh entities (keys) draw real triangles: from a close
    camera the key occupies pixels whose color matches the proto color,
    and its depth sits in front of the far wall."""
    import dataclasses
    import math

    import jax
    import jax.numpy as jnp
    import numpy as np

    from miniworld_tpu import MiniWorldVec
    from miniworld_tpu.scene.entities import SHAPE_MESH_TRIS

    env = MiniWorldVec("MiniWorld-PickupObjects-v0", num_envs=1,
                       obs_width=96, obs_height=72)
    state, _ = env.reset(jax.random.key(7))
    shp = env._bank_np.proto_shape[0]
    protos = np.asarray(state.ent_proto[0])
    alive = np.asarray(state.ent_alive[0])
    mesh_ents = [i for i in range(len(protos))
                 if shp[protos[i]] == SHAPE_MESH_TRIS and alive[i]]
    assert mesh_ents, "PickupObjects should place mesh entities"
    e = mesh_ents[0]
    tgt = np.asarray(state.ent_pos[0][e])
    cam = tgt + np.array([1.0, 0.0, 0.0])
    face = math.atan2(0.0, -1.0)  # look -x toward the key
    state = state.replace(
        pos=jnp.asarray([cam], jnp.float32),
        dir=jnp.asarray([face], jnp.float32),
        cam_pitch=jnp.asarray([-35.0], jnp.float32),
    )
    (obs, depth) = env._render_jit(env._bank, env._atlas, state)
    d = np.asarray(depth[0])[..., 0]
    # pixels closer than 2 m exist (the key) and are a contiguous blob
    near_px = (d < 2.0).sum()
    assert near_px > 20, near_px


def test_attr_carry_dtype_boundary():
    """bf16 slot-id exactness boundary: 256 rows ride bf16, 257 fall
    back to f32 (raycast.attr_carry_dtype)."""
    import jax.numpy as jnp
    from types import SimpleNamespace

    from miniworld_tpu.render.raycast import attr_carry_dtype

    state = SimpleNamespace(tex_map=np.zeros(300, np.int32))
    assert attr_carry_dtype(
        {"mode": "fourier", "coeffs": np.zeros((256, 7))}, state
    ) == jnp.bfloat16
    assert attr_carry_dtype(
        {"mode": "fourier", "coeffs": np.zeros((257, 7))}, state
    ) == jnp.float32
    assert attr_carry_dtype(
        {"mode": "nearest", "atlas": None},
        SimpleNamespace(tex_map=np.zeros(256, np.int32)),
    ) == jnp.bfloat16
    assert attr_carry_dtype(
        {"mode": "nearest", "atlas": None},
        SimpleNamespace(tex_map=np.zeros(257, np.int32)),
    ) == jnp.float32


def test_big_slot_tables_construct_and_stay_exact():
    """A 10x10 procgen super bank (3 x 220 local slots) constructs and
    renders; in nearest mode the f32 fallback is LOAD-BEARING — forcing
    the bf16 carry on its >256 local slot ids changes pixels (rounded
    ids cross room/role slots)."""
    import dataclasses

    import jax

    from miniworld_tpu import MiniWorldVec
    from miniworld_tpu.envs import make_spec
    from miniworld_tpu.render import raycast

    spec = dataclasses.replace(
        make_spec("MiniWorld-Maze-v0"), num_rows=10, num_cols=10,
        num_layouts=1,
    )
    env = MiniWorldVec(spec, num_envs=1, obs_width=32, obs_height=24,
                       procgen=True, tex_mode="nearest")
    assert env._bank_np.tex_slot_base.shape[1] > 256  # (L, T)
    state, (rgb, d) = env.reset(jax.random.key(0))
    assert np.asarray(rgb).shape == (1, 24, 32, 3)
    assert np.isfinite(np.asarray(d)).all()

    forced = lambda tex, st: jax.numpy.bfloat16
    orig = raycast.attr_carry_dtype
    try:
        raycast.attr_carry_dtype = forced
        env._make_jits()
        _, (rgb_bad, _) = env.reset(jax.random.key(0))
    finally:
        raycast.attr_carry_dtype = orig
        env._make_jits()
    assert np.any(np.asarray(rgb_bad) != np.asarray(rgb)), (
        "forcing bf16 on >256 slot ids should corrupt the render — "
        "if it doesn't, the f32 fallback is dead weight"
    )
