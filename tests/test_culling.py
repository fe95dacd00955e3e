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
    env = MiniWorldVec(spec, num_envs=8, bank_seed=3, domain_rand=True)
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


def test_schedule_is_conservative():
    """Every chunk containing a triangle of a PVS-visible room is in
    the schedule (host-side check of the planner's bound)."""
    spec = dataclasses.replace(make_spec("MiniWorld-MazeS3-v0"), num_layouts=4)
    env = MiniWorldVec(spec, num_envs=2, bank_seed=1)
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
