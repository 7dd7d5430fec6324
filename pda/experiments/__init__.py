"""Shared experiment plumbing for the LIVECell / MitoEM / Lung X-Ray CLIs."""

from .common import (
    adamatch_strong_augmentations,
    da_name,
    fm_strong_augmentations,
    livecell_punet,
    lung_data_path,
    lung_punet,
    mitoem_strong_augmentations,
    standard_parser,
    weak_augmentations,
)

__all__ = [
    "weak_augmentations",
    "fm_strong_augmentations",
    "adamatch_strong_augmentations",
    "mitoem_strong_augmentations",
    "livecell_punet",
    "lung_punet",
    "da_name",
    "standard_parser",
    "lung_data_path",
]
