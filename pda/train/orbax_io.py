"""Optional orbax checkpoint backend.

The engine's default checkpoint format is single-file flax msgpack
(pda.train.checkpoint) — the moral equivalent of the reference's ``.pt``
files, simple and portable. For users who want orbax's sharded /
cloud-storage trees (e.g. multi-host setups), these helpers write/read the
same TrainState through ``orbax.checkpoint``.
"""

from __future__ import annotations

import os

import jax

from .state import TrainState


def save_orbax(directory: str, state: TrainState) -> str:
    """Write the train state as an orbax PyTree checkpoint at <directory>."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(directory)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    return path


def load_orbax(directory: str, template: TrainState) -> TrainState:
    """Restore a train state written by :func:`save_orbax`."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(directory)
    ckptr = ocp.StandardCheckpointer()
    abstract = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype)
        if hasattr(x, "shape")
        else x,
        template,
    )
    return ckptr.restore(path, abstract)
