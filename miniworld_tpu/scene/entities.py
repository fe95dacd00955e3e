"""Entity definitions and their compiled prototypes.

Host-side entity model replacing the reference's OO entities
(miniworld/entity.py). Each entity *definition* carries the physical
attributes the reference derives (radius, height, colors), and compiles
to either:

  * baked static triangles (static meshes, ImageFrame, TextFrame — the
    reference renders these from the static display list,
    miniworld.py:1140-1143), or
  * a *prototype* row in a fixed-shape table for dynamic entities the
    raycaster draws analytically each frame.

Dynamic-entity shapes (round 1): BOX (exact), SPHERE (Ball — the
reference's ball mesh is a tessellated sphere), and MESH_BOX — an
oriented-bounding-box impostor for dynamic meshes (Key, medkit, duckie)
with the mesh's dominant color. Real dynamic-mesh triangles are a
planned upgrade; physics radii/heights match the reference exactly
either way.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np

from miniworld_tpu.render.textures import texture_pixel_size
from miniworld_tpu.scene.mesh import load_mesh
from miniworld_tpu.scene.room import TriBatch
from miniworld_tpu.utils.assets import texture_variant_paths

# Named colors (reference: miniworld/entity.py:30-40)
COLORS = {
    "red": np.array([1.0, 0.0, 0.0]),
    "green": np.array([0.0, 1.0, 0.0]),
    "blue": np.array([0.0, 0.0, 1.0]),
    "purple": np.array([0.44, 0.15, 0.76]),
    "yellow": np.array([1.00, 1.00, 0.00]),
    "grey": np.array([0.39, 0.39, 0.39]),
}
COLOR_NAMES = sorted(COLORS.keys())

# Shape codes for the raycaster's dynamic-entity pass
SHAPE_NONE = 0
SHAPE_BOX = 1
SHAPE_SPHERE = 2
SHAPE_MESH_BOX = 3
SHAPE_HULL = 4

# max half-space planes per dynamic-mesh hull impostor
MAX_HULL_PLANES = 16


def rot_y(angle: float) -> np.ndarray:
    """Column-vector rotation about +Y; R @ (1,0,0) == dir_vec(angle)."""
    c, s = math.cos(angle), math.sin(angle)
    return np.array([[c, 0.0, s], [0.0, 1.0, 0.0], [-s, 0.0, c]])


@dataclass
class Proto:
    """One dynamic-entity prototype row."""

    shape: int
    size: np.ndarray  # (3,) box dims / impostor dims; sphere: (d, h, d)
    radius: float
    height: float
    color: np.ndarray  # (3,)
    colorable: bool = False  # Box: obj_color_bias applies (entity.py:405-407)
    static: bool = False
    pickable: bool = True  # not is_static
    # (MAX_HULL_PLANES, 8) half-spaces [n(3), d, color(3), pad] with
    # n.x + d <= 0 inside, zero-padded; only meaningful for SHAPE_HULL
    hull_planes: np.ndarray | None = None

    def __post_init__(self):
        self.size = np.asarray(self.size, dtype=np.float64)
        self.color = np.asarray(self.color, dtype=np.float64)


def _face_colors_areas(mesh):
    """Per-face effective colors (Kd x mean texture color) and areas."""
    v = mesh.verts
    areas = 0.5 * np.linalg.norm(
        np.cross(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0]), axis=1
    )
    colors = mesh.colors.copy()
    tex_means = {}
    for t, tex in enumerate(mesh.tex_names):
        if tex is not None:
            if tex not in tex_means:
                from PIL import Image

                with Image.open(tex) as im:
                    tex_means[tex] = np.asarray(
                        im.convert("RGB").resize((8, 8))
                    ).reshape(-1, 3).mean(axis=0) / 255.0
            colors[t] = colors[t] * tex_means[tex]
    return colors, areas


def _mesh_color(mesh) -> np.ndarray:
    """Area-weighted mean color of a mesh (Kd x mean texture color)."""
    colors, areas = _face_colors_areas(mesh)
    w = areas / max(areas.sum(), 1e-9)
    return (colors * w[:, None]).sum(axis=0)


def mesh_scale_radius(mesh_name: str, height: float):
    """MeshEnt scale/radius derivation (miniworld/entity.py:132-148)."""
    mesh = load_mesh(mesh_name)
    sx, sy, sz = mesh.ref_max_coords
    scale = height / sy
    radius = math.sqrt(sx * sx + sz * sz) * scale
    return mesh, scale, radius


def box_proto(color: str, size=0.8) -> Proto:
    """Colored box (miniworld/entity.py:386-432)."""
    if isinstance(size, (int, float)):
        size = np.array([size, size, size], dtype=np.float64)
    size = np.asarray(size, dtype=np.float64)
    sx, sy, sz = size
    return Proto(
        shape=SHAPE_BOX,
        size=size,
        radius=math.sqrt(sx * sx + sz * sz) / 2,
        height=float(sy),
        color=COLORS[color],
        colorable=True,
    )


def ball_proto(color: str, size=0.6) -> Proto:
    """Ball = ball_{color} mesh at height ``size`` (entity.py:445-452).

    Rendered as an analytic sphere (the source mesh is a tessellated
    sphere); physics radius follows the MeshEnt formula.
    """
    mesh, scale, radius = mesh_scale_radius(f"ball_{color}", size)
    return Proto(
        shape=SHAPE_SPHERE,
        size=np.array([size, size, size]),
        radius=radius,
        height=float(size),
        color=_mesh_color(mesh),
    )


def key_proto(color: str) -> Proto:
    """Key = key_{color} mesh at height 0.35 (entity.py:435-442)."""
    return mesh_box_proto(f"key_{color}", 0.35, static=False)


def mesh_box_proto(mesh_name: str, height: float, static: bool = True) -> Proto:
    """Mesh entity impostor with the mesh's color.

    Static meshes keep the OBB (their visuals are baked triangles; the
    proto only matters for collision). Dynamic meshes render as a
    convex-hull impostor — the hull of the scaled mesh reduced to at
    most MAX_HULL_PLANES half-spaces — which preserves silhouettes
    (keys look like keys, not crates) at ~3x a box's intersection cost.
    """
    mesh, scale, radius = mesh_scale_radius(mesh_name, height)
    dims = (mesh.bbox_hi - mesh.bbox_lo) * scale
    proto = Proto(
        shape=SHAPE_MESH_BOX if static else SHAPE_HULL,
        size=dims,
        radius=radius,
        height=float(height),
        color=_mesh_color(mesh),
        static=static,
        pickable=not static,
    )
    if not static:
        proto.hull_planes = _hull_planes(mesh, scale)
    return proto


def _hull_planes(mesh, scale: float, max_planes: int = MAX_HULL_PLANES):
    """Reduce a mesh to <= max_planes outer half-spaces with colors.

    Convex hull facets are merged by normal direction (quantized to a
    coarse angular grid, keeping each direction's outermost offset) and
    ranked by facet area until the budget is met. Each plane carries
    the area-weighted color of the MESH faces whose normals best align
    with it (duckie beaks stay orange, medkits pick up their cross
    tint). Padding rows are all-zero (n = 0 never constrains the slab
    test).
    """
    from scipy.spatial import ConvexHull

    points = mesh.verts.reshape(-1, 3) * scale
    hull = ConvexHull(points)
    eqs = hull.equations  # (F, 4): n.x + d <= 0 inside
    areas = np.zeros(len(eqs))
    for i, simplex in enumerate(hull.simplices):
        a, b, c = points[simplex]
        areas[i] = 0.5 * np.linalg.norm(np.cross(b - a, c - a))
    merged: dict = {}
    for eq, area in zip(eqs, areas):
        key = tuple(np.round(eq[:3] * 4).astype(int))
        if key in merged:
            n_old, d_old, a_old = merged[key]
            # keep the enclosing (outermost) offset
            if eq[3] > d_old:
                merged[key] = (eq[:3], eq[3], a_old + area)
            else:
                merged[key] = (n_old, d_old, a_old + area)
        else:
            merged[key] = (eq[:3], eq[3], area)
    ranked = sorted(merged.values(), key=lambda t: -t[2])[:max_planes]

    # per-plane colors: assign each mesh face to its best-aligned plane
    f_colors, f_areas = _face_colors_areas(mesh)
    v = mesh.verts
    f_n = np.cross(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0])
    f_len = np.maximum(np.linalg.norm(f_n, axis=1, keepdims=True), 1e-12)
    f_n = f_n / f_len
    plane_ns = np.array([n for n, _, _ in ranked])  # (Q,3)
    fallback = _mesh_color(mesh)
    aligns = f_n @ plane_ns.T  # (F, Q)
    best = np.argmax(aligns, axis=1)
    out = np.zeros((max_planes, 8), dtype=np.float32)
    for i, (n, d, _) in enumerate(ranked):
        out[i, :3] = n
        out[i, 3] = d
        sel = (best == i) & (aligns[np.arange(len(best)), best] > 0.5)
        if sel.any():
            w = f_areas[sel]
            out[i, 4:7] = (f_colors[sel] * w[:, None]).sum(0) / max(
                w.sum(), 1e-9
            )
        else:
            out[i, 4:7] = fallback
    return out


def bake_static_mesh(
    tris: TriBatch, mesh_name: str, height: float, pos, direction, tex_slot_fn
):
    """Bake a static MeshEnt into the scene triangle soup.

    Applies the reference's model transform (translate, uniform scale,
    CCW yaw rotation; miniworld/entity.py:150-161).
    """
    mesh, scale, _ = mesh_scale_radius(mesh_name, height)
    r = rot_y(float(direction))
    pos = np.asarray(pos, dtype=np.float64)
    verts = np.einsum("ij,tvj->tvi", r, mesh.verts * scale) + pos
    for t in range(mesh.num_tris):
        v = verts[t]
        n = np.cross(v[1] - v[0], v[2] - v[0])
        nl = np.linalg.norm(n)
        if nl < 1e-12:
            continue
        n = n / nl
        tex = mesh.tex_names[t]
        slot = tex_slot_fn(tex) if tex is not None else -1
        tris.add_tri(v, mesh.uvs[t], n, slot, mesh.colors[t])


def bake_image_frame(
    tris: TriBatch, pos, direction, tex_name: str, width: float, slot: int,
    depth: float = 0.05, height: float | None = None,
):
    """Bake an ImageFrame: textured front face + black border box.

    Geometry mirrors ImageFrame.render (miniworld/entity.py:191-262);
    ``height`` defaults to preserving the image aspect ratio.
    """
    if height is None:
        tw, th = texture_pixel_size(texture_variant_paths(tex_name)[0])
        height = (th / tw) * width
    sx, hz, hy = depth, width / 2, height / 2
    r = rot_y(float(direction))
    pos = np.asarray(pos, dtype=np.float64)

    def tq(v4, uv4, normal, tslot, color=(1, 1, 1)):
        v4 = np.einsum("ij,vj->vi", r, np.asarray(v4, dtype=np.float64)) + pos
        n = r @ np.asarray(normal, dtype=np.float64)
        tris.add_quad(v4, uv4, n, tslot, color)

    # Front face (facing +X in local frame), image UVs flipped in u.
    tq(
        [[sx, +hy, -hz], [sx, +hy, +hz], [sx, -hy, +hz], [sx, -hy, -hz]],
        [[1, 1], [0, 1], [0, 0], [1, 0]],
        [1, 0, 0],
        slot,
    )
    black = (0.0, 0.0, 0.0)
    zero_uv = [[0, 0]] * 4
    tq([[0, +hy, -hz], [+sx, +hy, -hz], [+sx, -hy, -hz], [0, -hy, -hz]],
       zero_uv, [0, 0, -1], -1, black)
    tq([[+sx, +hy, +hz], [0, +hy, +hz], [0, -hy, +hz], [+sx, -hy, +hz]],
       zero_uv, [0, 0, 1], -1, black)
    tq([[+sx, +hy, +hz], [+sx, +hy, -hz], [0, +hy, -hz], [0, +hy, +hz]],
       zero_uv, [0, 1, 0], -1, black)
    tq([[+sx, -hy, -hz], [+sx, -hy, +hz], [0, -hy, +hz], [0, -hy, -hz]],
       zero_uv, [0, -1, 0], -1, black)


def bake_text_frame(
    tris: TriBatch, pos, direction, text: str, tex_slot_fn,
    height: float = 0.15, depth: float = 0.05,
):
    """Bake a TextFrame: one textured quad per character + black box.

    Mirrors TextFrame.render (miniworld/entity.py:301-383); the front
    quads sit at local x=0.05 regardless of ``depth`` (reference quirk).
    Character texture names are ``chars/ch_0x{ord}`` with variants, so
    glyph randomization rides the texture-variant mechanism.
    """
    width = len(text) * height
    sx, hz, hy = 0.05, width / 2, height / 2
    r = rot_y(float(direction))
    pos = np.asarray(pos, dtype=np.float64)

    def tq(v4, uv4, normal, tslot, color=(1, 1, 1)):
        v4 = np.einsum("ij,vj->vi", r, np.asarray(v4, dtype=np.float64)) + pos
        n = r @ np.asarray(normal, dtype=np.float64)
        tris.add_quad(v4, uv4, n, tslot, color)

    for idx, ch in enumerate(text):
        if ch == " ":
            continue
        slot = tex_slot_fn(f"chars/ch_0x{ord(ch)}")
        cw = height
        z0 = hz - cw * (idx + 1)
        z1 = z0 + cw
        tq(
            [[sx, +hy, z0], [sx, +hy, z1], [sx, -hy, z1], [sx, -hy, z0]],
            [[1, 1], [0, 1], [0, 0], [1, 0]],
            [1, 0, 0],
            slot,
        )

    black = (0.0, 0.0, 0.0)
    zero_uv = [[0, 0]] * 4
    tq([[0, +hy, -hz], [+sx, +hy, -hz], [+sx, -hy, -hz], [0, -hy, -hz]],
       zero_uv, [0, 0, -1], -1, black)
    tq([[+sx, +hy, +hz], [0, +hy, +hz], [0, -hy, +hz], [+sx, -hy, +hz]],
       zero_uv, [0, 0, 1], -1, black)
    tq([[+sx, +hy, +hz], [+sx, +hy, -hz], [0, +hy, -hz], [0, +hy, +hz]],
       zero_uv, [0, 1, 0], -1, black)
    tq([[+sx, -hy, -hz], [+sx, -hy, +hz], [0, -hy, +hz], [0, -hy, -hz]],
       zero_uv, [0, -1, 0], -1, black)
