"""Evaluation: dice runners over prediction/GT file trees."""

from .dice import (
    run_dice_evaluation,
    run_dice_evaluation_for_pseudo,
    run_em_dice_evaluation,
    run_lung_dice_evaluation,
)

__all__ = [
    "run_dice_evaluation",
    "run_lung_dice_evaluation",
    "run_em_dice_evaluation",
    "run_dice_evaluation_for_pseudo",
]
