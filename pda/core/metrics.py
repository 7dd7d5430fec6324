"""Dice score — the repo-wide evaluation primitive.

Mirrors reference prob_utils/my_utils/util.py:17-44 (numpy) and provides a
jittable jnp twin for in-graph validation metrics.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

_EPS = 1e-7


def dice_score(
    segmentation: np.ndarray,
    groundtruth: np.ndarray,
    threshold_seg: Optional[float] = None,
    threshold_gt: Optional[float] = None,
) -> float:
    """Soft/hard dice between a segmentation and ground truth (numpy, host).

    Exact semantics of reference util.py:17-44: optional thresholds binarize
    either input; score = 2*sum(gt*seg) / (sum(gt) + sum(seg) + eps).
    """
    assert segmentation.shape == groundtruth.shape, (
        f"{segmentation.shape}, {groundtruth.shape}"
    )
    seg = segmentation if threshold_seg is None else segmentation > threshold_seg
    gt = groundtruth if threshold_gt is None else groundtruth > threshold_gt

    nom = 2 * np.sum(np.asarray(gt, dtype=np.float64) * np.asarray(seg, dtype=np.float64))
    denom = np.sum(gt) + np.sum(seg)
    return float(nom) / float(denom + _EPS)


def dice_score_jnp(
    segmentation: jax.Array,
    groundtruth: jax.Array,
    threshold_seg: Optional[float] = None,
    threshold_gt: Optional[float] = None,
    axis_name: Optional[str] = None,
) -> jax.Array:
    """Jittable twin of :func:`dice_score` for on-device validation.

    Lets the MC-validation metric (reference punet_trainer.py:70-86, which
    round-trips to host numpy per batch) stay inside the XLA program.
    ``axis_name``: inside shard_map, the sums psum across batch shards before
    the ratio — the sharded score equals the global-batch score exactly.
    """
    seg = segmentation if threshold_seg is None else (segmentation > threshold_seg)
    gt = groundtruth if threshold_gt is None else (groundtruth > threshold_gt)
    seg = seg.astype(jnp.float32)
    gt = gt.astype(jnp.float32)
    nom = 2.0 * jnp.sum(gt * seg)
    denom = jnp.sum(gt) + jnp.sum(seg)
    if axis_name is not None:
        nom = jax.lax.psum(nom, axis_name)
        denom = jax.lax.psum(denom, axis_name)
    return nom / (denom + _EPS)
