"""Mesh + sharding utilities — the framework's entire distribution story.

The reference is strictly single-device (SURVEY.md section 2.8: no
torch.distributed anywhere); the TPU build adds data parallelism the JAX way:
a 1-D ``data`` mesh axis over ICI, batches sharded on their leading axis,
parameters replicated, gradient psums inserted by the compiler. There is no
user-visible communication backend — shardings ARE the API.

An optional ``tile`` axis is exposed for spatially-sharded halo inference
(SURVEY.md section 5.7), the closest meaningful analog of context parallelism
for this conv workload.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
TILE_AXIS = "tile"


def get_mesh(
    n_devices: Optional[int] = None,
    *,
    devices: Optional[Sequence[jax.Device]] = None,
    axis_name: str = DATA_AXIS,
) -> Mesh:
    """A 1-D mesh over the given (default: all) devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, ndim: int = 4, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) axis over the mesh, replicate the rest."""
    return NamedSharding(mesh, P(axis_name, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    """Fully-replicated sharding (parameters, optimizer state, scalars)."""
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis_name: str = DATA_AXIS):
    """Device_put a pytree of host arrays with leading-axis sharding.

    Per-leaf ndim is respected so mixed-rank batches (images + scalars) work.
    """

    def _put(x):
        x = np.asarray(x)
        if x.ndim == 0:
            return jax.device_put(x, replicated(mesh))
        return jax.device_put(x, batch_sharding(mesh, x.ndim, axis_name))

    return jax.tree_util.tree_map(_put, batch)
