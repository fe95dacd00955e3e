"""Checkpoint/resume for env state + learner params (orbax).

The reference has no training checkpoints (SURVEY.md §5 — its only
resume path is the dataset appender). Here env state is a pytree, so
whole-fleet simulation state (thousands of envs mid-episode) and
learner params checkpoint and restore exactly, including across
restarts with a different device layout (orbax handles resharding).
"""

from __future__ import annotations

import jax


def save(path: str, tree) -> None:
    """Synchronously save a pytree (EnvState batch, params, ...)."""
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckpt:
        ckpt.save(path, tree, force=True)


def restore(path: str, like=None):
    """Restore a pytree; ``like`` provides structure/sharding template."""
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckpt:
        if like is not None:
            return ckpt.restore(path, item=like)
        return ckpt.restore(path)
