"""Device mesh + sharding helpers for multi-chip / multi-host scaling.

The reference has no distributed runtime at all (SURVEY.md §2.12: its
"multiple processes" claim is one env per OS process). Here the env
*batch* axis is the parallel axis: state pytrees are sharded over a 1-D
``data`` mesh axis spanning all chips (ICI within a slice, DCN across
hosts), stepping runs under ``shard_map`` with zero cross-env
communication, and collectives appear only in the learner (gradient
``psum``) — the layout recommended by the scaling-book recipe: pick a
mesh, annotate shardings, let XLA insert collectives.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D mesh over all (or the first n) local+global devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (DATA_AXIS,))


def init_multihost():
    """Initialize the multi-host process group (no-op when single).

    Fail-fast contract (SURVEY.md §5): when the environment says this
    IS a multi-host launch (a coordinator address is configured), an
    initialization failure raises immediately instead of silently
    degrading to a single-host run that would train on a fraction of
    the batch. Only the unconfigured single-process case falls through.
    """
    if jax.process_count() > 1:
        return  # already initialized by the launcher
    configured = any(
        os.environ.get(k)
        for k in ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS")
    )
    try:
        jax.distributed.initialize()
    except Exception as e:
        if configured:
            raise RuntimeError(
                "multi-host init failed with a coordinator configured "
                f"(fail-fast, refusing single-host fallback): {e}"
            ) from e
        # no cluster configured: normal single-process run


def env_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for batched env pytrees: batch axis over ``data``."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_env_batch(mesh: Mesh, tree):
    """Device-put a batched pytree with the env axis over the mesh."""
    s = env_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)


def replicate(mesh: Mesh, tree):
    r = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, r), tree)
