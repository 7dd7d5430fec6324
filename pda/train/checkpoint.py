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

# Checkpoint file layout: magic + u64-le meta length + meta JSON + msgpack
# payload. Embedding the metadata makes one os.replace the single commit
# point — a crash can never pair a new state with a stale sidecar. The .json
# sidecar is still written (after the commit point) for human inspection and
# legacy readers, but loads prefer the embedded copy.
_MAGIC = b"PDACKPT1"


def _pack(payload: bytes, meta: dict) -> bytes:
    meta_b = json.dumps(meta).encode()
    return _MAGIC + len(meta_b).to_bytes(8, "little") + meta_b + payload


def _unpack(raw: bytes) -> tuple[bytes, Optional[dict]]:
    if raw[: len(_MAGIC)] == _MAGIC:
        off = len(_MAGIC)
        n = int.from_bytes(raw[off : off + 8], "little")
        meta = json.loads(raw[off + 8 : off + 8 + n].decode())
        return raw[off + 8 + n :], meta
    return raw, None  # legacy file: raw msgpack, meta only in the sidecar


def _atomic_write(path: str, data: bytes):
    """write-tmp + flush + fsync + rename: survives both process crashes and
    (on journaled filesystems with delayed allocation) power loss — without
    the fsync the rename can be journaled before the payload blocks land,
    leaving a truncated file. The tmp name is pid-unique so two trainings
    sharing a checkpoint dir cannot interleave writes into one inode before
    the rename (each os.replace then publishes a complete payload)."""
    tmp = f"{path}.tmp.{os.getpid()}"
    try:
        with open(tmp, "wb") as f:
            f.write(data)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


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
    meta = {
        "step": int(state.step),
        "current_metric": float(current_metric),
        "best_metric": float(best_metric),
        "train_time": float(train_time),
        "has_teacher": state.teacher_params is not None,
    }
    if extra:
        meta.update(extra)
    # State + meta committed as ONE atomically-renamed file: resume
    # (``fit(overwrite_training=False)``) can never observe a new state paired
    # with stale bookkeeping or a truncated write.
    _atomic_write(path, _pack(payload, meta))
    # human-readable sidecar, written after the commit point
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
        payload, meta = _unpack(f.read())
    state = serialization.from_bytes(template, payload)
    if meta is None:  # legacy checkpoint: meta lives only in the sidecar
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
        payload, _ = _unpack(f.read())
    raw = serialization.msgpack_restore(payload)
    subtree = raw[key]
    return serialization.from_state_dict(params_template, subtree)


def checkpoint_exists(directory: str, which: str = BEST) -> bool:
    return os.path.exists(os.path.join(directory, f"{which}.ckpt"))
