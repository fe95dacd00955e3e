"""Golden tests for geometry ops against a float64 numpy oracle.

The oracle functions re-derive the reference's math (miniworld/math.py,
miniworld/entity.py camera properties) independently in numpy; the JAX
ops must agree to f32 tolerance.
"""

import math

import numpy as np
import jax.numpy as jnp

from miniworld_tpu.ops import geom


# ---- oracle (numpy float64, transcribed reference semantics) ----------

def oracle_rot_matrix(axis, angle):
    axis = np.asarray(axis, dtype=float)
    axis = axis / math.sqrt(np.dot(axis, axis))
    a = math.cos(angle / 2.0)
    b, c, d = -axis * math.sin(angle / 2.0)
    return np.array(
        [
            [a * a + b * b - c * c - d * d, 2 * (b * c - a * d), 2 * (b * d + a * c)],
            [2 * (b * c + a * d), a * a + c * c - b * b - d * d, 2 * (c * d - a * b)],
            [2 * (b * d - a * c), 2 * (c * d + a * b), a * a + d * d - b * b - c * c],
        ]
    )


def oracle_cam_dir(yaw, pitch_deg):
    rot_z = oracle_rot_matrix(np.array([0, 0, 1.0]), pitch_deg * math.pi / 180)
    rot_y = oracle_rot_matrix(np.array([0, 1.0, 0]), yaw)
    d = np.dot(np.array([1.0, 0, 0]), rot_z)
    return np.dot(d, rot_y)


def oracle_cam_up(yaw, pitch_deg):
    rot_z = oracle_rot_matrix(np.array([0, 0, 1.0]), pitch_deg * math.pi / 180)
    rot_y = oracle_rot_matrix(np.array([0, 1.0, 0]), yaw)
    up = np.dot(np.array([0, 1.0, 0]), rot_z)
    up = np.dot(up, rot_y)
    return up / np.linalg.norm(up)


def oracle_cam_pos(pos, yaw, cam_height, cam_fwd_disp):
    rot_y = oracle_rot_matrix(np.array([0, 1.0, 0]), yaw)
    disp = np.dot(np.array([cam_fwd_disp, cam_height, 0.0]), rot_y)
    return pos + disp


def oracle_intersect_circle_segs(point, radius, segs):
    """miniworld/math.py:30-62, with (S,2,2) XZ segments."""
    a = segs[:, 0, :]
    b = segs[:, 1, :]
    ab = b - a
    ap = point[None, :] - a
    t = np.clip(np.sum(ap * ab, axis=1) / np.sum(ab * ab, axis=1), 0, 1)
    c = a + t[:, None] * ab
    return bool(np.any(np.linalg.norm(c - point[None, :], axis=1) < radius))


# ---- tests -------------------------------------------------------------

def test_rot_matrix_matches_oracle():
    rng = np.random.default_rng(0)
    for _ in range(20):
        axis = rng.normal(size=3)
        angle = rng.uniform(-2 * math.pi, 2 * math.pi)
        got = np.asarray(geom.gen_rot_matrix(jnp.asarray(axis), angle))
        want = oracle_rot_matrix(axis, angle)
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_dir_right_vectors():
    for d in np.linspace(-7, 7, 29):
        np.testing.assert_allclose(
            np.asarray(geom.yaw_dir_vec(jnp.float32(d))),
            [math.cos(d), 0, -math.sin(d)],
            atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(geom.yaw_right_vec(jnp.float32(d))),
            [math.sin(d), 0, math.cos(d)],
            atol=1e-5,
        )


def test_cam_basis_matches_reference_properties():
    rng = np.random.default_rng(1)
    for _ in range(25):
        yaw = rng.uniform(-math.pi, math.pi)
        pitch = rng.uniform(-89, 89)
        fwd, up, right = geom.cam_basis(jnp.float32(yaw), jnp.float32(pitch))
        np.testing.assert_allclose(np.asarray(fwd), oracle_cam_dir(yaw, pitch), atol=1e-5)
        np.testing.assert_allclose(np.asarray(up), oracle_cam_up(yaw, pitch), atol=1e-5)
        # right completes an orthonormal frame
        assert abs(np.dot(fwd, up)) < 1e-5
        assert abs(np.dot(fwd, right)) < 1e-5
        np.testing.assert_allclose(np.linalg.norm(right), 1.0, atol=1e-5)


def test_cam_position_matches_oracle():
    rng = np.random.default_rng(2)
    for _ in range(10):
        pos = rng.uniform(-5, 5, size=3)
        yaw = rng.uniform(-math.pi, math.pi)
        h = rng.uniform(1.4, 1.6)
        disp = rng.uniform(-0.05, 0.1)
        got = np.asarray(
            geom.cam_position(jnp.asarray(pos, jnp.float32), jnp.float32(yaw),
                              jnp.float32(h), jnp.float32(disp))
        )
        np.testing.assert_allclose(got, oracle_cam_pos(pos, yaw, h, disp), atol=1e-5)


def test_circle_segs_matches_oracle():
    rng = np.random.default_rng(3)
    segs = rng.uniform(-5, 5, size=(12, 2, 2))
    mask = np.ones(12, dtype=bool)
    for _ in range(50):
        p = rng.uniform(-6, 6, size=2)
        r = rng.uniform(0.1, 1.5)
        got = bool(
            geom.intersect_circle_segs(
                jnp.asarray(p, jnp.float32), jnp.float32(r),
                jnp.asarray(segs, jnp.float32), jnp.asarray(mask),
            )
        )
        assert got == oracle_intersect_circle_segs(p, r, segs)


def test_circle_segs_padding_ignored():
    segs = np.zeros((4, 2, 2))
    segs[0] = [[0, 0], [1, 0]]
    mask = np.array([True, False, False, False])
    # circle at origin hits the real seg
    assert bool(
        geom.intersect_circle_segs(
            jnp.array([0.0, 0.1]), jnp.float32(0.2),
            jnp.asarray(segs, jnp.float32), jnp.asarray(mask),
        )
    )
    # padding rows at the origin must NOT count
    assert not bool(
        geom.intersect_circle_segs(
            jnp.array([5.0, 5.0]), jnp.float32(0.2),
            jnp.asarray(segs, jnp.float32), jnp.asarray(mask),
        )
    )


def test_point_inside_convex():
    # unit square, CCW as the reference builds it (miniworld.py:820-833)
    outline = np.array([[1, 1], [1, 0], [0, 0], [0, 1]], dtype=np.float32)
    nxt = np.roll(outline, -1, axis=0)
    d = nxt - outline
    d = d / np.linalg.norm(d, axis=1, keepdims=True)
    # inward normal in XZ: -cross(dir, Y) restricted to (x, z)
    norms = np.stack([d[:, 1], -d[:, 0]], axis=1)
    mask = np.ones(4, dtype=bool)
    inside = lambda p: bool(
        geom.point_inside_convex(
            jnp.asarray(p, jnp.float32), jnp.asarray(outline),
            jnp.asarray(norms), jnp.asarray(mask),
        )
    )
    assert inside([0.5, 0.5])
    assert not inside([1.5, 0.5])
    assert not inside([0.5, -0.1])
    # boundary is strictly outside (reference uses > 0)
    assert not inside([0.0, 0.5])


def test_circle_vs_entities_first_index():
    pos = jnp.array([0.0, 0.0])
    ent_xz = jnp.array([[0.1, 0.0], [0.05, 0.0], [3.0, 3.0]])
    r = jnp.array([0.2, 0.2, 0.2])
    mask = jnp.array([True, True, True])
    idx = int(geom.circle_vs_entities(pos, jnp.float32(0.3), ent_xz, r, mask))
    assert idx == 0  # lowest index wins, like the reference's list order
    mask = jnp.array([False, True, True])
    idx = int(geom.circle_vs_entities(pos, jnp.float32(0.3), ent_xz, r, mask))
    assert idx == 1
    mask = jnp.array([False, False, False])
    idx = int(geom.circle_vs_entities(pos, jnp.float32(0.3), ent_xz, r, mask))
    assert idx == -1
