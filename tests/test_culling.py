"""PVS chunk culling must be invisible: culled renders == full scans.

The chunk schedule (scene/pvs.py + render/raycast.chunk_schedule) may
only skip triangles no ray can hit first; any visible difference is a
correctness bug (a missed room in the PVS), not a quality tradeoff.
Exercised over multi-room scenes with portals, junction rooms, and
diagonal walls, from states reached by random walks (so cameras sit in
portals, corners, and mid-carry poses).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from miniworld_tpu.envs import make_spec
from miniworld_tpu.vector import MiniWorldVec


def _render_pair(env, state):
    """(culled, full) rgb+depth batches for the same states."""
    culled = env._render_jit(env._bank, env._atlas, state)

    saved_vis, saved_len = env._chunk_vis, env._sched_len
    env._chunk_vis, env._sched_len = None, None
    try:
        full = jax.jit(env._render_batch)(env._bank, env._atlas, state)
    finally:
        env._chunk_vis, env._sched_len = saved_vis, saved_len
    return culled, full


@pytest.mark.parametrize(
    "env_id,num_layouts",
    [
        ("MiniWorld-MazeS3-v0", 6),
        ("MiniWorld-Maze-v0", 2),
        ("MiniWorld-FourRooms-v0", 1),
        ("MiniWorld-YMazeLeft-v0", 1),
        ("MiniWorld-TMazeRight-v0", 1),
    ],
)
def test_culled_render_identical(env_id, num_layouts):
    spec = make_spec(env_id)
    if spec.num_layouts > num_layouts:
        spec = dataclasses.replace(spec, num_layouts=num_layouts)
    env = MiniWorldVec(spec, num_envs=8, bank_seed=3, domain_rand=True,
                       procgen=False)
    if env._chunk_vis is None:
        pytest.skip(f"{env_id}: culling not engaged (full scan optimal)")

    key = jax.random.key(0)
    state, _ = env.reset(key)
    for i in range(3):
        (rgb_c, d_c), (rgb_f, d_f) = _render_pair(env, state)
        np.testing.assert_array_equal(np.asarray(rgb_c), np.asarray(rgb_f))
        np.testing.assert_array_equal(np.asarray(d_c), np.asarray(d_f))
        key, k_act = jax.random.split(key)
        for _ in range(10):
            k_act, k = jax.random.split(k_act)
            acts = env.sample_actions(k)
            state, _, _, _, _ = env.step(state, acts)


def _no_packed(*a, **k):
    return None, a[1], None, np.inf


def _no_culling(bank_np, chunk_cap):
    return None, chunk_cap, None


from miniworld_tpu.vector import _chunk_visibility as _orig_chunk_visibility


def _all_visible(bank_np, chunk: int):
    return np.ones_like(_orig_chunk_visibility(bank_np, chunk))


def _make_maze_packed(monkeypatch, num_envs=4, domain_rand=True):
    """(packed env, full-scan baseline env) for Maze 8x8, 2 layouts."""
    import miniworld_tpu.vector as V

    spec = dataclasses.replace(make_spec("MiniWorld-Maze-v0"), num_layouts=2)
    kw = dict(num_envs=num_envs, bank_seed=3, domain_rand=domain_rand,
              obs_width=64, obs_height=48, procgen=False)
    packed = MiniWorldVec(spec, **kw)
    with monkeypatch.context() as m:
        m.setattr(V, "plan_packed_pvs", _no_packed)
        m.setattr(V, "plan_culling", _no_culling)
        m.setattr(V, "_chunk_visibility", _all_visible)
        full = MiniWorldVec(spec, **kw)
    return packed, full


def _assert_rgb_tie_equal(rgb_p, rgb_f):
    """rgb equal except a vanishing quantized-z-fight allowance.

    Per-prim det/u/v/r are bank-order-invariant (the separable
    contraction uses only per-prim data), so hit sets and quantized
    depths are bit-identical across the packed and full banks — the
    ONLY legal divergence is the tie-break when two DISTINCT coplanar
    prims share a quantized depth key: the within-chunk row index that
    breaks the tie differs between bank orderings (GL z-fights are
    order-dependent too). Such flips must be vanishingly rare; depth
    stays bit-equal at them by construction (asserted exactly by the
    caller)."""
    rgb_p, rgb_f = np.asarray(rgb_p), np.asarray(rgb_f)
    diff = (rgb_p != rgb_f).any(axis=-1)
    frac = diff.mean()
    assert frac <= 2e-4, (frac, int(diff.sum()))


def test_packed_pvs_render_identical(monkeypatch):
    """Packed per-room PVS banks are render-exact: a packed env and a
    full-scan env driven by the same reset key and action stream emit
    identical depth (bit-exact) and identical rgb up to the
    quantized-z-fight tie allowance (_assert_rgb_tie_equal)."""
    env_p, env_f = _make_maze_packed(monkeypatch)
    assert env_p._pvs_packed, "packed planner did not engage on Maze 8x8"
    assert not env_f._pvs_packed and env_f._chunk_vis is None

    key = jax.random.key(0)
    state_p, (rgb_p, d_p) = env_p.reset(key)
    state_f, (rgb_f, d_f) = env_f.reset(key)
    _assert_rgb_tie_equal(rgb_p, rgb_f)
    np.testing.assert_array_equal(np.asarray(d_p), np.asarray(d_f))
    k_act = jax.random.key(1)
    for _ in range(8):
        k_act, k = jax.random.split(k_act)
        acts = env_p.sample_actions(k)
        state_p, (rgb_p, d_p), r_p, dn_p, _ = env_p.step(state_p, acts)
        state_f, (rgb_f, d_f), r_f, dn_f, _ = env_f.step(state_f, acts)
        _assert_rgb_tie_equal(rgb_p, rgb_f)
        np.testing.assert_array_equal(np.asarray(d_p), np.asarray(d_f))
        np.testing.assert_array_equal(np.asarray(r_p), np.asarray(r_f))
        np.testing.assert_array_equal(np.asarray(dn_p), np.asarray(dn_f))


def test_packed_pvs_covers_pvs(monkeypatch):
    """Host-side: each room's scheduled packed range contains every
    triangle of every PVS-visible room plus the globals (tri_room -1).

    The device schedule reads chunks [base, base+sched_len) with
    dynamic_slice start-clamping, so the effective coverage is
    [base*K, min(base*K + sched_len*K, S2)) — that window must hold a
    verbatim copy (exact f32 verts9 column) of every required tri."""
    env_p, _ = _make_maze_packed(monkeypatch, num_envs=2)
    bank = env_p._bank_np
    K, sched = env_p.tri_chunk, env_p._sched_len
    S2 = bank.pvs_verts9.shape[-1]
    for li in range(bank.tri_room.shape[0]):
        packed_cols = bank.pvs_verts9[li].T  # (S2, 9)
        for r in range(bank.room_mask.shape[1]):
            if not bank.room_mask[li, r]:
                continue
            base = int(bank.pvs_room_base[li, r]) * K
            lo = min(base, max(S2 - sched * K, 0))
            win = packed_cols[lo:base + sched * K]
            required = (
                bank.tri_mask[li]
                & ((bank.tri_room[li] == -1)
                   | ((bank.tri_room[li] >= 0)
                      & bank.room_pvs[li, r][
                          np.maximum(bank.tri_room[li], 0)]))
            )
            need = bank.tri_verts9[li].T[required]  # (n, 9)
            present = (win[None, :, :] == need[:, None, :]).all(-1).any(-1)
            assert present.all(), (li, r, int((~present).sum()))


def test_schedule_is_conservative():
    """Every chunk containing a triangle of a PVS-visible room is in
    the schedule (host-side check of the planner's bound)."""
    spec = dataclasses.replace(make_spec("MiniWorld-MazeS3-v0"), num_layouts=4)
    env = MiniWorldVec(spec, num_envs=2, bank_seed=1, procgen=False)
    if env._chunk_vis is None:
        pytest.skip("culling not engaged")
    bank = env._bank_np
    vis = np.asarray(env._chunk_vis)
    K = env.tri_chunk
    S = bank.tri_room.shape[1]
    n_chunks = vis.shape[1]
    for li in range(bank.tri_room.shape[0]):
        for r in range(bank.room_mask.shape[1]):
            if not bank.room_mask[li, r]:
                continue
            assert vis[li, :, r].sum() <= env._sched_len
            for c in range(n_chunks):
                start = min(c * K, S - K)
                rooms = bank.tri_room[li, start:start + K]
                rooms = rooms[bank.tri_mask[li, start:start + K]]
                needed = (rooms == -1).any() or any(
                    bank.room_pvs[li, r, rr] for rr in rooms[rooms >= 0]
                )
                if needed:
                    assert vis[li, c, r], (li, r, c)
