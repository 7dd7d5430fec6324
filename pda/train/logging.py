"""TensorBoard logging — scalar tags + image panels matching the reference.

Reference loggers (SURVEY.md section 2.2/5.5): one logger class per trainer,
log dir ``./logs/<name>`` or ``<save_root>/logs/<name>``, scalar tags
train/loss, train/learning_rate, validation/loss, validation/metric,
validation/gt_metric, train/distr_ratio_{bg,fg}; image grids of
input/augs/pseudo/consensus/GT/samples every ``log_image_interval`` steps.

One class covers all of them here — the trainers simply pass whichever images
they have. Uses tensorboardX (pure-python writer, no torch dependency).
"""

from __future__ import annotations

import os
from typing import Mapping, Optional

import numpy as np

try:
    from tensorboardX import SummaryWriter

    _HAS_TB = True
except Exception:  # pragma: no cover - tensorboardX is in the image
    _HAS_TB = False


def _normalize(img: np.ndarray, eps: float = 1e-7) -> np.ndarray:
    """Min-max normalize for display (torch_em _normalize_torch equivalent,
    used by every reference logger, e.g. mean_teacher_trainer.py:209)."""
    img = np.asarray(img, dtype=np.float32)
    img = img - img.min()
    return img / (img.max() + eps)


def make_grid(images, nrow: int = 4, padding: int = 4) -> np.ndarray:
    """Tile HxWx1 images into a grid (torchvision make_grid equivalent,
    reference punet_trainer.py:113, fixmatch_trainer.py:194)."""
    imgs = [np.asarray(im, dtype=np.float32) for im in images]
    h, w = imgs[0].shape[:2]
    ncol = nrow
    nrow_ = (len(imgs) + ncol - 1) // ncol
    grid = np.zeros(
        (nrow_ * h + (nrow_ + 1) * padding, ncol * w + (ncol + 1) * padding),
        dtype=np.float32,
    )
    for idx, im in enumerate(imgs):
        r, c = divmod(idx, ncol)
        y0 = padding + r * (h + padding)
        x0 = padding + c * (w + padding)
        grid[y0 : y0 + h, x0 : x0 + w] = im.squeeze()
    return grid


class TrainLogger:
    """Scalars + image panels for any trainer."""

    #: DOCUMENTATION of the panel set the matching trainer writes (set by
    #: the reference-named subclasses below). The panels themselves come
    #: from the trainer's ``make_panel_fn``/``assemble_panels``; these
    #: lists exist so the contract is greppable and test-pinned
    #: (tests/test_logging.py asserts the written tag set EQUALS the
    #: trainer's ``image_tags`` — a panel-key rename fails the pin).
    image_tags: tuple = ()

    def __init__(
        self,
        name: str,
        save_root: Optional[str] = None,
        log_image_interval: int = 100,
    ):
        self.log_dir = (
            f"./logs/{name}" if save_root is None else os.path.join(save_root, "logs", name)
        )
        os.makedirs(self.log_dir, exist_ok=True)
        self.tb = SummaryWriter(self.log_dir) if _HAS_TB else None
        self.log_image_interval = log_image_interval

    def log_train(
        self,
        step: int,
        scalars: Mapping[str, float],
        images: Optional[Mapping[str, np.ndarray]] = None,
    ):
        if self.tb is None:
            return
        for tag, value in scalars.items():
            self.tb.add_scalar(f"train/{tag}", float(value), step)
        if images and step % self.log_image_interval == 0:
            self._add_images("train", step, images)

    def log_validation(
        self,
        step: int,
        scalars: Mapping[str, float],
        images: Optional[Mapping[str, np.ndarray]] = None,
    ):
        if self.tb is None:
            return
        for tag, value in scalars.items():
            self.tb.add_scalar(f"validation/{tag}", float(value), step)
        if images:
            self._add_images("validation", step, images)

    #: tags min-max normalized for display — exactly the raw-intensity input
    #: views the reference loggers pass through ``_normalize_torch``
    #: (mean_teacher_trainer.py:209-213, adamt_trainer.py:209-211 etc.);
    #: pseudo-labels / consensus / predictions / sample grids are logged raw
    NORMALIZED_TAGS = frozenset({
        "input", "aug_inputs_1", "aug_inputs_2", "weak_aug", "weak_aug1",
        "weak_aug2", "strong_aug", "target_input", "target_inputs",
        "source_input",
    })

    def _add_images(self, prefix: str, step: int, images: Mapping[str, np.ndarray]):
        for tag, img in images.items():
            img = np.asarray(img, dtype=np.float32)
            if img.ndim == 4:  # batch of NHWC: take the first element
                img = img[0]
            if img.ndim == 3 and img.shape[-1] in (1, 3):  # HWC -> CHW
                img = np.moveaxis(img, -1, 0)
            elif img.ndim == 2:
                img = img[None]
            norm = tag in self.NORMALIZED_TAGS
            self.tb.add_image(
                f"{prefix}/{tag}", _normalize(img) if norm else img, step
            )

    def close(self):
        if self.tb is not None:
            self.tb.close()


# ---------------------------------------------------------------------------
# Reference-named logger classes. The reference exposes one TensorBoard
# logger class per trainer (prob_utils/my_trainer/__init__.py: PUNetLogger,
# PseudoLogger, MeanTeacherLogger, FixMatchLogger, AdaMTLogger,
# AdaMatchLogger) and trainers take the CLASS as a constructor argument
# (torch_em pattern). Here all behavior lives in TrainLogger (the trainer
# computes its image panels via ``make_panel_fn``); these subclasses carry
# the reference names + documented panel lists so reference code passing
# ``logger=PUNetLogger`` works unchanged.
# ---------------------------------------------------------------------------


class PUNetLogger(TrainLogger):
    """Reference punet_trainer.py:100-125: input, target, 16-sample grid.

    Unlike the torch_em base logger, the reference PUNetLogger writes the
    input tensor RAW (punet_trainer.py:111 calls ``add_image`` without
    ``_normalize_torch``) — so 'input' is excluded from the display
    normalization here."""

    image_tags = ("input", "target", "samples")
    NORMALIZED_TAGS = TrainLogger.NORMALIZED_TAGS - {"input"}


class PseudoLogger(TrainLogger):
    """Reference punet_target_trainer.py:70-89 — torch_em's inherited
    ``add_image`` (input/target/prediction); the PUNet variant trainer logs
    a sample grid instead of the prediction."""

    image_tags = ("input", "target", "prediction")


class MeanTeacherLogger(TrainLogger):
    """Reference mean_teacher_trainer.py:205-217: input + both augmented
    views, teacher pseudo-labels + consensus, ground truth, model MC mean."""

    image_tags = ("input", "aug_inputs_1", "aug_inputs_2",
                  "teacher_predictions", "teacher_consensus", "ground_truth",
                  "model_samples")


class FixMatchLogger(TrainLogger):
    """Reference fixmatch_trainer.py:193-196: ONE make_grid panel of
    [weak, strong, pseudo-labels, prediction]."""

    image_tags = ("weak-strong-labels-pred",)


class AdaMTLogger(TrainLogger):
    """Reference adamt_trainer.py:203-215 (the reference writes both weak
    views under one colliding ``weak_aug1`` tag; they get distinct tags
    here — see steps.make_adamt_panels)."""

    image_tags = ("target_inputs", "weak_aug1", "weak_aug2",
                  "teacher_predictions", "teacher_consensus",
                  "target_ground_truth", "model_samples")


class AdaMatchLogger(TrainLogger):
    """Reference adamatch_trainer.py:183-196."""

    image_tags = ("target_inputs", "weak_aug", "strong_aug",
                  "weak_model_predictions", "weak_model_consensus",
                  "target_ground_truth", "model_samples")
