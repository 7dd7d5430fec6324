"""Dice evaluation runners — glob GT trees, remap filenames, report mean dice.

Exact capability twin of reference prob_utils/my_evaluations/
my_dice_evaluations.py including the per-dataset filename remaps
(lucchi ``maskXXXX.tif``, urocell ``_gt -> _image``, jsrt2 suffix strip,
mitoem ``im`` prefix) and the threshold conventions (pred>0.5 for LIVECell,
gt>0 for lung/EM). Each runner returns the mean dice in addition to printing
it (the reference only prints — returning makes the runners testable)."""

from __future__ import annotations

import os
from glob import glob
from typing import List, Optional

import numpy as np

from ..core.metrics import dice_score


def _imread(path: str) -> np.ndarray:
    import imageio.v3 as imageio

    return np.asarray(imageio.imread(path))


def run_dice_evaluation(
    gt_f_path: str, pred_path: str, subtype: Optional[str] = None, verbose: bool = True
) -> float:
    """LIVECell-style evaluation: pred thresholded at 0.5 vs binarized GT
    (reference my_dice_evaluations.py:10-36)."""
    scores: List[float] = []
    for my_path in sorted(glob(gt_f_path)):
        fname = os.path.basename(my_path)
        if subtype == "lucchi":
            fname = f"mask{int(fname[:-4]):04}.tif"
        elif subtype == "urocell":
            fname = fname.replace("_gt", "_image")
        f_pred_path = os.path.join(pred_path, f"{fname[:-4]}.tif")

        pred = _imread(f_pred_path)
        gt = _imread(my_path)
        gt = (gt > 0).astype("uint8")
        if subtype == "lucchi" and gt.ndim > 2:
            gt = gt[:, :, 0]
        scores.append(dice_score(pred, gt, threshold_seg=0.5))

    mean = sum(scores) / len(scores) if scores else float("nan")
    if verbose:
        print(f"Average Dice Score for '{subtype}' - {round(mean, 3)}")
    return mean


def run_lung_dice_evaluation(
    gt_f_path: str, pred_path: str, lung_domain: str, verbose: bool = True
) -> float:
    """Lung variant: jsrt2 filename remap, threshold_gt=0
    (reference my_dice_evaluations.py:39-61)."""
    scores: List[float] = []
    for my_path in sorted(glob(gt_f_path + "*")):
        imagename = os.path.basename(my_path)
        if lung_domain == "jsrt2":
            # JSRT-segmentation02 GT names carry a 6-char annotation suffix
            # before the extension (reference my_dice_evaluations.py:51-52).
            # Fall back to the identity mapping when the prediction named by
            # the remap doesn't exist (non-JSRT naming, e.g. smoke fixtures).
            f_pred_path = os.path.join(pred_path, imagename[:-10] + ".tif")
            if not os.path.exists(f_pred_path):
                f_pred_path = os.path.join(pred_path, imagename[:-4] + ".tif")
        else:
            f_pred_path = os.path.join(pred_path, imagename[:-4] + ".tif")

        pred = _imread(f_pred_path)
        gt = _imread(my_path)
        gt = np.where(gt != 0, 1, gt)
        scores.append(dice_score(pred, gt, threshold_gt=0))

    mean = sum(scores) / len(scores) if scores else float("nan")
    if verbose:
        print(f"Average Dice Score - {round(mean, 3)}")
    return mean


def run_em_dice_evaluation(
    gt_f_path: str, pred_path: str, model: str, verbose: bool = True
) -> float:
    """EM variant with vnc/lucchi/mitoem remaps
    (reference my_dice_evaluations.py:64-93)."""
    scores: List[float] = []
    for my_path in sorted(glob(gt_f_path + "*")):
        gt = _imread(my_path)
        gt = np.where(gt != 0, 1, gt)
        imagename = os.path.basename(my_path)
        if model == "vnc":
            f_pred_path = os.path.join(pred_path, imagename[:-4] + ".tif")
        elif model == "lucchi":
            f_pred_path = os.path.join(pred_path, f"mask{int(imagename[:-4]):04}.tif")
            if gt.ndim > 2:
                gt = gt[:, :, 0]
        elif model == "mitoem":
            f_pred_path = os.path.join(pred_path, "im" + imagename[3:])
        else:
            f_pred_path = os.path.join(pred_path, imagename)

        pred = _imread(f_pred_path)
        scores.append(dice_score(pred, gt, threshold_gt=0))

    mean = sum(scores) / len(scores) if scores else float("nan")
    if verbose:
        print(f"Average Dice Score - {round(mean, 3)}")
    return mean


def run_dice_evaluation_for_pseudo(
    gt_f_path: str,
    pred_path: str,
    consensus_mask_path: str,
    model: str = "punet",
    verbose: bool = True,
) -> float:
    """Dice restricted to consensus-mask pixels — evaluates pseudo-label
    quality where the mask is confident (reference my_dice_evaluations.py:96-123)."""
    scores: List[float] = []
    for my_path in sorted(glob(gt_f_path + "*.tif")):
        imagename = os.path.basename(my_path)
        if model == "unet":
            f_pred_path = os.path.join(pred_path, imagename[:-4] + "-c0.tif")
        else:
            f_pred_path = os.path.join(pred_path, imagename)
        cm_path = os.path.join(consensus_mask_path, imagename)

        pred = _imread(f_pred_path)
        gt = _imread(my_path)
        consensus = _imread(cm_path)
        gt = np.where(gt != 0, 1, gt)
        mask = consensus == 1
        scores.append(dice_score(pred[mask], gt[mask], threshold_gt=0))

    mean = sum(scores) / len(scores) if scores else float("nan")
    if verbose:
        print(
            f"Average Dice over all {model} Predictions is - {round(mean, 3)}"
        )
    return mean
