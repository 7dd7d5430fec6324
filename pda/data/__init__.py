"""Data pipelines: transforms, patch datasets, loader, dataset builders."""

from .datasets import (
    ConcatDataset,
    DualImageCollectionDataset,
    DualRawImageCollectionDataset,
    DualSegmentationDataset,
    ImageCollectionDataset,
    MinForegroundSampler,
    SegmentationDataset,
    load_image,
)
from .loader import Loader, get_data_loader
from .transforms import (
    AdditiveGaussianNoise,
    Compose,
    GaussianBlur,
    RandomApply,
    RandomContrast,
    affinity_transform,
    boundary_transform,
    get_augmentations,
    get_raw_transform,
    labels_to_binary,
    normalize,
    standardize,
)

__all__ = [
    "ImageCollectionDataset",
    "DualImageCollectionDataset",
    "DualRawImageCollectionDataset",
    "SegmentationDataset",
    "DualSegmentationDataset",
    "ConcatDataset",
    "MinForegroundSampler",
    "load_image",
    "Loader",
    "get_data_loader",
    "standardize",
    "normalize",
    "Compose",
    "RandomApply",
    "GaussianBlur",
    "AdditiveGaussianNoise",
    "RandomContrast",
    "get_raw_transform",
    "get_augmentations",
    "labels_to_binary",
    "boundary_transform",
    "affinity_transform",
]
