"""On-device tile + halo decomposition for full-frame inference.

TPU-native replacement for torch_em ``predict_with_halo``
(reference call sites: prob_utils/my_predictions/punet_predictions.py:41-49,
unet_predictions.py:25-38 — block (384, 384), halo (64, 64)). The reference
crops tiles on the host and round-trips every tile through the device; here the
full frame is padded once, ALL overlapping tiles are gathered as one batch
with static shapes, the model runs over the tile batch in a single XLA
program, and the halo-cropped centers are stitched back in device memory
(SURVEY.md section 5.7).

Everything is shape-static given (image_shape, block, halo), so each distinct
frame geometry compiles exactly once.
"""

from __future__ import annotations

import math
from typing import Callable, Tuple

import jax
import jax.numpy as jnp


def grid_shape(image_shape: Tuple[int, int], block: Tuple[int, int]) -> Tuple[int, int]:
    return (
        math.ceil(image_shape[0] / block[0]),
        math.ceil(image_shape[1] / block[1]),
    )


def extract_tiles(
    image: jax.Array, block: Tuple[int, int], halo: Tuple[int, int]
) -> jax.Array:
    """(H, W, C) -> (n_tiles, block+2*halo ..., C) overlapping tile batch.

    The image is reflect-padded to a whole number of blocks plus the halo
    margin; tiles are gathered by ONE vmapped dynamic slice over the tile-origin
    grid, so the program (and its compile time) is constant in the number of
    tiles — a 16x16-grid EM frame compiles as fast as LIVECell's 2x2.
    """
    h, w, c = image.shape
    bh, bw = block
    hh, hw = halo
    gy, gx = grid_shape((h, w), block)
    pad_h = gy * bh - h
    pad_w = gx * bw - w
    padded = jnp.pad(
        image,
        ((hh, pad_h + hh), (hw, pad_w + hw), (0, 0)),
        mode="reflect",
    )
    ys = jnp.arange(gy, dtype=jnp.int32) * bh
    xs = jnp.arange(gx, dtype=jnp.int32) * bw
    origins = jnp.stack(
        [jnp.repeat(ys, gx), jnp.tile(xs, gy)], axis=-1
    )  # (gy*gx, 2), row-major to match stitch_tiles

    def _one(origin):
        return jax.lax.dynamic_slice(
            padded, (origin[0], origin[1], 0), (bh + 2 * hh, bw + 2 * hw, c)
        )

    return jax.vmap(_one)(origins)


def stitch_tiles(
    tile_outputs: jax.Array,
    image_shape: Tuple[int, int],
    block: Tuple[int, int],
    halo: Tuple[int, int],
) -> jax.Array:
    """Inverse of :func:`extract_tiles`: crop each tile's halo, reassemble the
    block grid, crop the padding -> (H, W, C)."""
    h, w = image_shape
    bh, bw = block
    hh, hw = halo
    gy, gx = grid_shape((h, w), block)
    c = tile_outputs.shape[-1]
    centers = tile_outputs[:, hh : hh + bh, hw : hw + bw, :]
    grid = centers.reshape(gy, gx, bh, bw, c)
    full = grid.transpose(0, 2, 1, 3, 4).reshape(gy * bh, gx * bw, c)
    return full[:h, :w, :]


def tile_standardize(tiles: jax.Array, eps: float = 1e-7) -> jax.Array:
    """Per-tile mean/std normalization — torch_em ``predict_with_halo``
    standardizes every block independently (its default preprocess)."""
    mean = jnp.mean(tiles, axis=(1, 2, 3), keepdims=True)
    centered = tiles - mean
    std = jnp.std(centered, axis=(1, 2, 3), keepdims=True)
    return centered / (std + eps)


def pad_to_divisible(
    image: jax.Array, divisor: Tuple[int, int]
) -> Tuple[jax.Array, Tuple[int, int]]:
    """Reflect-pad (H, W, C) so spatial dims divide ``divisor`` — the
    ``predict_with_padding(min_divisible=(16, 16))`` equivalent (reference
    unet_predictions.py:33-38)."""
    h, w, _ = image.shape
    ph = (divisor[0] - h % divisor[0]) % divisor[0]
    pw = (divisor[1] - w % divisor[1]) % divisor[1]
    return jnp.pad(image, ((0, ph), (0, pw), (0, 0)), mode="reflect"), (h, w)
