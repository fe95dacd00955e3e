"""LeRobot v3 writer tests (reference: tests/test_lerobot_writer.py plus
format-shape checks)."""

import json

import numpy as np
import pytest

pytest.importorskip("pyarrow")

from miniworld_tpu.io.lerobot import (
    DatasetManager,
    Episode,
    EpisodeWriter,
    build_state_vector,
)


def _fake_episode(n=5, task="t"):
    ep = Episode(task=task)
    for t in range(n):
        ep.add(
            frame=np.full((8, 8, 3), t, np.uint8),
            action=np.array([t, 0.5], np.float32),
            state=np.array([1.0, 2.0, 3.0], np.float32),
            reward=float(t),
            done=t == n - 1,
        )
    return ep


def test_build_state_vector_layout():
    info = {
        "agent": {"pos": [1.0, 0.0, 2.0], "dir": 0.5, "cam_pitch": -3.0},
        "b_extra": np.array([7.0, 8.0]),
        "a_extra": 5.0,
    }
    v = build_state_vector(info)
    np.testing.assert_allclose(v, [1, 0, 2, 0.5, -3, 5, 7, 8])
    assert build_state_vector(None) is None
    assert build_state_vector({"x": 1}) is None


def test_write_and_layout(tmp_path):
    dm = DatasetManager(tmp_path / "ds", fps=10)
    dm.add_episode(_fake_episode(5))
    dm.add_episode(_fake_episode(3))
    dm.finalize()
    root = tmp_path / "ds"
    assert (root / "meta" / "info.json").exists()
    assert (root / "meta" / "tasks.parquet").exists()
    assert (root / "meta" / "stats.json").exists()
    assert (root / "meta" / "episodes" / "chunk-000" / "episodes-000.parquet").exists()
    assert (root / "data" / "chunk-000" / "file-000.parquet").exists()
    info = json.loads((root / "meta" / "info.json").read_text())
    assert info["total_episodes"] == 2
    assert info["total_frames"] == 8
    assert info["codebase_version"] == "v3.0"
    assert info["features"]["action"]["shape"] == [2]

    import pyarrow.parquet as pq

    table = pq.read_table(root / "data" / "chunk-000" / "file-000.parquet")
    assert table.num_rows == 5
    assert set(table.column_names) >= {
        "index", "episode_index", "frame_index", "timestamp", "task_index",
        "action", "observation.state", "next.reward", "next.done",
        "next.success",
    }


def test_append_resume(tmp_path):
    """Append mode continues episode/frame indexing
    (lerobot_writer.py:312-407; tests/test_lerobot_writer.py:19-33)."""
    root = tmp_path / "ds"
    dm = DatasetManager(root, fps=10)
    dm.add_episode(_fake_episode(4))
    dm.finalize()

    dm2 = DatasetManager(root, fps=10, append=True)
    assert dm2.num_episodes == 1
    dm2.add_episode(_fake_episode(6))
    dm2.finalize()
    info = json.loads((root / "meta" / "info.json").read_text())
    assert info["total_episodes"] == 2
    assert info["total_frames"] == 10

    import pyarrow.parquet as pq

    epi = pq.read_table(
        root / "meta" / "episodes" / "chunk-000" / "episodes-000.parquet"
    ).to_pylist()
    assert epi[1]["dataset_from_index"] == 4
    assert epi[1]["dataset_to_index"] == 10


def test_add_batch_splits_episodes(tmp_path):
    dm = DatasetManager(tmp_path / "ds", fps=10)
    T, B = 6, 2
    frames = np.zeros((T, B, 8, 8, 3), np.uint8)
    actions = np.zeros((T, B, 2), np.float32)
    rewards = np.zeros((T, B), np.float32)
    dones = np.zeros((T, B), bool)
    dones[2, 0] = True  # env 0: episodes of length 3 and 3
    dm.add_batch(frames, actions, rewards, dones)
    dm.finalize()
    # env0 -> 2 episodes (3+3), env1 -> 1 episode (6)
    assert dm.num_episodes == 3


def test_episode_writer_context(tmp_path):
    dm = DatasetManager(tmp_path / "ds", fps=10)
    with EpisodeWriter(dm) as w:
        for t in range(3):
            w.add_sample(np.zeros((8, 8, 3), np.uint8), [0.0], reward=1.0)
        assert w.num_frames == 3
    assert dm.num_episodes == 1


def test_episode_paths_resolve(tmp_path):
    """Every episodes-table row's template path must point at a real
    file (the round-1 writer put the file index in the chunk_index
    column while writing everything into chunk-000 — a LeRobot reader
    would have resolved data/chunk-005/... and found nothing)."""
    import pyarrow.parquet as pq

    from miniworld_tpu.io.lerobot import DATA_TEMPLATE, VIDEO_KEY, VIDEO_TEMPLATE

    mgr = DatasetManager(tmp_path / "ds", fps=10)
    for _ in range(4):
        mgr.add_episode(_fake_episode())
    mgr.finalize()

    table = pq.read_table(
        tmp_path / "ds/meta/episodes/chunk-000/episodes-000.parquet"
    ).to_pylist()
    assert len(table) == 4
    for row in table:
        data_path = tmp_path / "ds" / DATA_TEMPLATE.format(
            chunk_index=row["data/chunk_index"],
            file_index=row["data/file_index"],
        )
        assert data_path.exists(), data_path
        video_path = tmp_path / "ds" / VIDEO_TEMPLATE.format(
            video_key=VIDEO_KEY,
            chunk_index=row[f"videos/{VIDEO_KEY}/chunk_index"],
            file_index=row[f"videos/{VIDEO_KEY}/file_index"],
        )
        # mp4 may fall back to .npz without an ffmpeg backend
        assert video_path.exists() or video_path.with_suffix(".npz").exists()


def test_append_resume_chunked_layout(tmp_path):
    """Append mode continues chunk/file indices under the per-file
    chunk-dir layout (reference lerobot_writer.py:534-560)."""
    root = tmp_path / "ds"
    mgr = DatasetManager(root, fps=10)
    mgr.add_episode(_fake_episode())
    mgr.add_episode(_fake_episode())
    mgr.finalize()

    mgr2 = DatasetManager(root, fps=10, append=True)
    mgr2.add_episode(_fake_episode())
    mgr2.finalize()

    assert (root / "data/chunk-002/file-002.parquet").exists()
    info = json.loads((root / "meta/info.json").read_text())
    assert info["total_episodes"] == 3
