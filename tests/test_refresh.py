"""Layout-bank refresh: unbounded procedural diversity on the device
path.

The reference regenerates its world every reset (miniworld.py:558-618;
Maze builds a fresh recursive-backtracker maze per episode,
miniworld/envs/maze.py:100-149). MiniWorldVec draws from a compiled
layout bank instead; refresh_layouts swaps in freshly generated banks
between rollouts so the training distribution is unbounded over time —
shape-stable, so the swap costs zero recompilation.
"""

import jax
import numpy as np
import pytest

from miniworld_tpu import MiniWorldVec
from miniworld_tpu.envs.nav import Maze, MazeS3


def _maze_fingerprints(bank_np, spec):
    """One hashable fingerprint per layout: the sorted junction-room
    AABBs. Each junction room sits in the gap between two connected
    cells, so the set uniquely encodes the maze's spanning tree."""
    n_cells = spec.num_rows * spec.num_cols
    fps = []
    for li in range(bank_np.room_mask.shape[0]):
        rooms = np.where(bank_np.room_mask[li])[0]
        junctions = rooms[rooms >= n_cells]
        aabbs = np.round(bank_np.room_aabb[li][junctions], 3)
        fps.append(tuple(sorted(map(tuple, aabbs.tolist()))))
    return fps


# MazeS3 x 4 layouts runs full scans (no culling pays off at that
# size); the 4x4 maze picks packed-PVS banks — both refresh paths are
# exercised.
SPECS = {
    "fullscan": lambda: MazeS3(num_layouts=4),
    "packed": lambda: Maze(num_rows=4, num_cols=4, num_layouts=4),
}


@pytest.fixture(scope="module", params=sorted(SPECS))
def env(request):
    e = MiniWorldVec(SPECS[request.param](), num_envs=4,
                     obs_width=32, obs_height=24, procgen=False)
    if request.param == "packed":
        assert e._pvs_packed
    return e


def test_refresh_changes_layouts_without_recompile(env):
    state, obs = env.reset(jax.random.key(0))
    state, obs, outs = env.rollout(state, obs, jax.random.key(1), 3)
    spec = env.spec

    sizes_before = {
        f: None if getattr(env._bank_np, f) is None
        else getattr(env._bank_np, f).shape
        for f in ("tri_verts", "segs", "room_mask", "pvs_attr",
                  "pvs_room_base")
    }
    fps0 = set(_maze_fingerprints(env._bank_np, spec))
    caches = [env._render_jit._cache_size(),
              env._reset_jit._cache_size()]

    seen = set(fps0)
    grew = 0
    for seed in (101, 202):
        env.refresh_layouts(seed)
        # shapes identical -> compiled programs reused
        for f, shp in sizes_before.items():
            arr = getattr(env._bank_np, f)
            assert (arr.shape if arr is not None else None) == shp, f
        fps = _maze_fingerprints(env._bank_np, spec)
        # connectivity invariant: a recursive-backtracker maze is a
        # spanning tree -> exactly R*C-1 connections, each materialized
        # as one junction room (maze.py:100-149; gap_size > 0)
        n_cells = spec.num_rows * spec.num_cols
        for li, fp in enumerate(fps):
            assert len(fp) == n_cells - 1, (li, len(fp))
        new = [fp for fp in fps if fp not in seen]
        grew += len(new)
        seen.update(fps)
        # the refreshed bank still rollouts (same compiled program)
        state, obs = env.reset(jax.random.key(seed))
        state, obs, outs = env.rollout(state, obs, jax.random.key(2), 3)
        assert bool(np.isfinite(np.asarray(outs["obs_sum"]).sum()))
    # distributional growth: refreshes produced layouts outside the
    # original fixed bank
    assert grew >= 4, grew
    assert env._render_jit._cache_size() == caches[0]
    assert env._reset_jit._cache_size() == caches[1]


def test_refresh_matches_fresh_build(env):
    """A refreshed bank's content equals a from-scratch build with the
    same seed (same generator, same padding), so refresh introduces no
    drift in the maze distribution."""
    import dataclasses

    env.refresh_layouts(777)
    env2 = MiniWorldVec(dataclasses.replace(env.spec), num_envs=4,
                        obs_width=32, obs_height=24, bank_seed=777,
                        procgen=False)
    np.testing.assert_array_equal(env._bank_np.tri_verts,
                                  env2._bank_np.tri_verts)
    np.testing.assert_array_equal(env._bank_np.segs, env2._bank_np.segs)
    if env._bank_np.pvs_attr is not None:
        np.testing.assert_array_equal(env._bank_np.pvs_room_base,
                                      env2._bank_np.pvs_room_base)
