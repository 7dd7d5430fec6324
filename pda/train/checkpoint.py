"""Checkpointing: best/latest semantics, teacher state, warm starts.

Mirrors the reference's checkpoint contract (SURVEY.md section 5.4):
``checkpoints/<name>/best.ckpt`` and ``latest.ckpt`` holding the full train
state (params, optimizer, step, RNG) plus ``teacher_params`` for the
mean-teacher trainers (reference mean_teacher_trainer.py:57-65) and the
best-metric bookkeeping torch_em's DefaultTrainer keeps. ``save_root``
relocates the tree (reference mitoem_mt.py:55).

Serialization is flax msgpack — a single self-contained file per checkpoint,
the moral equivalent of the reference's ``.pt`` files.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import jax
import numpy as np
from flax import serialization

from .state import TrainState

BEST = "best"
LATEST = "latest"


def checkpoint_dir(name: str, save_root: Optional[str] = None) -> str:
    root = "./checkpoints" if save_root is None else os.path.join(save_root, "checkpoints")
    return os.path.join(root, name)


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(
    directory: str,
    state: TrainState,
    *,
    which: str = LATEST,
    current_metric: float = float("inf"),
    best_metric: float = float("inf"),
    train_time: float = 0.0,
    extra: Optional[dict] = None,
) -> str:
    """Write ``<directory>/<which>.ckpt`` (+ a small JSON sidecar)."""
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, f"{which}.ckpt")
    payload = serialization.to_bytes(_to_host(state))
    # Write-then-rename: a crash mid-write must never corrupt the checkpoint
    # resume depends on (``fit(overwrite_training=False)`` reads latest.ckpt).
    with open(path + ".tmp", "wb") as f:
        f.write(payload)
    os.replace(path + ".tmp", path)
    meta = {
        "step": int(state.step),
        "current_metric": float(current_metric),
        "best_metric": float(best_metric),
        "train_time": float(train_time),
        "has_teacher": state.teacher_params is not None,
    }
    if extra:
        meta.update(extra)
    meta_path = os.path.join(directory, f"{which}.json")
    with open(meta_path + ".tmp", "w") as f:
        json.dump(meta, f)
    os.replace(meta_path + ".tmp", meta_path)
    return path


def load_checkpoint(
    directory: str, template: TrainState, *, which: str = BEST
) -> tuple[TrainState, dict]:
    """Restore a checkpoint into the structure of ``template``."""
    path = os.path.join(directory, f"{which}.ckpt")
    with open(path, "rb") as f:
        state = serialization.from_bytes(template, f.read())
    meta_path = os.path.join(directory, f"{which}.json")
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return state, meta


def load_params(directory: str, params_template, *, which: str = BEST, key: str = "params"):
    """Load only a parameter subtree from a checkpoint — the warm-start path
    (reference mean_teacher_trainer.py:44-50 loads ``model_state`` from the
    source checkpoint into both student and teacher).

    ``key`` selects ``params`` (model_state equivalent) or ``teacher_params``
    (teacher_state equivalent, used for prediction by the MT/AdaMT scripts,
    e.g. LIVECell/livecell_adamt.py:166).
    """
    path = os.path.join(directory, f"{which}.ckpt")
    with open(path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    subtree = raw[key]
    return serialization.from_state_dict(params_template, subtree)


def checkpoint_exists(directory: str, which: str = BEST) -> bool:
    return os.path.exists(os.path.join(directory, f"{which}.ckpt"))
