"""Inference: on-device tiled halo MC prediction + pseudo-label export."""

from .predict import (
    BLOCK_SHAPE,
    HALO,
    punet_prediction,
    punet_pseudo_prediction,
    unet_prediction,
)
from .tiling import (
    extract_tiles,
    grid_shape,
    pad_to_divisible,
    stitch_tiles,
    tile_standardize,
)

__all__ = [
    "punet_prediction",
    "punet_pseudo_prediction",
    "unet_prediction",
    "BLOCK_SHAPE",
    "HALO",
    "extract_tiles",
    "stitch_tiles",
    "tile_standardize",
    "pad_to_divisible",
    "grid_shape",
]
