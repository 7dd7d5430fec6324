"""Mesh + sharding utilities — the framework's entire distribution story.

The reference is strictly single-device (SURVEY.md section 2.8: no
torch.distributed anywhere); the TPU build adds data parallelism the JAX way:
a 1-D ``data`` mesh axis over ICI, batches sharded on their leading axis,
parameters replicated, gradient psums inserted by the compiler. There is no
user-visible communication backend — shardings ARE the API.

An optional ``tile`` axis is exposed for spatially-sharded halo inference
(SURVEY.md section 5.7), the closest meaningful analog of context parallelism
for this conv workload.

Spatial parallelism for TRAINING is the second optional axis: a 2-D
(``data``, ``space``) mesh shards image rows (the H axis of NHWC batches)
over ``space``. The DEFAULT path runs the whole step inside ``jax.shard_map``
with EXPLICIT halo exchange: each conv block extends its row shard with
``jax.lax.ppermute``-ed boundary rows from the neighbors, runs the fused
Pallas kernels per shard, and crops (``pda.models.blocks._conv3_space_sharded``);
the align-corners upsample exchanges one boundary row and applies a sliced
interpolation matrix; the encoders' global pooling and the loss reductions
psum across the row shards (steps ``_with_space``). Equality with the
single-device step is pinned (tests/test_parallel.py::TestSpatialShardMap).
Use it when the spatial extent, not the batch, is the scaling axis (whole EM
frames at train time). ``PDA_DP_IMPL=gspmd`` restores the partitioner path
(plain XLA convs, the trainer pins ``PDA_PALLAS_CONV=0`` while tracing) —
needed when row shards are too small for the halo machinery (the shard_map
path raises with the required minimum).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
TILE_AXIS = "tile"
SPACE_AXIS = "space"


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
        if len(devices) < n_devices:
            raise ValueError(
                f"need {n_devices} devices, have {len(devices)}"
            )
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def get_mesh_2d(
    n_data: int,
    n_space: int,
    *,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """A 2-D (``data``, ``space``) mesh: batch x image-rows sharding.

    ``n_data * n_space`` devices are taken in order; lay the ``space`` axis
    along ICI neighbors (the default device order on a slice) so the per-conv
    halo exchanges ride one hop.
    """
    if devices is None:
        devices = jax.devices()
    n = n_data * n_space
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    grid = np.asarray(devices[:n]).reshape(n_data, n_space)
    return Mesh(grid, (DATA_AXIS, SPACE_AXIS))


def batch_sharding(mesh: Mesh, ndim: int = 4, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) axis over ``data``; on a mesh with a
    ``space`` axis, rank>=3 arrays (NHWC / NHW images) also shard their
    row (H) axis over it. Everything else is replicated."""
    spec = [None] * ndim
    spec[0] = axis_name
    if SPACE_AXIS in mesh.axis_names and ndim >= 3:
        spec[1] = SPACE_AXIS
    return NamedSharding(mesh, P(*spec))


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
        n_data = mesh.shape.get(axis_name, 1)
        if x.shape[0] % n_data:
            raise ValueError(
                f"batch size {x.shape[0]} is not divisible by the mesh's "
                f"'{axis_name}' axis ({n_data}); pick a batch size that is "
                f"a multiple of it (watch out for a short final batch)"
            )
        n_space = mesh.shape.get(SPACE_AXIS, 1)
        if x.ndim >= 3 and x.shape[1] % n_space:
            raise ValueError(
                f"image height {x.shape[1]} is not divisible by the mesh's "
                f"'{SPACE_AXIS}' axis ({n_space})"
            )
        return jax.device_put(x, batch_sharding(mesh, x.ndim, axis_name))

    return jax.tree_util.tree_map(_put, batch)
