"""Prediction pipelines: tiled MC inference, pseudo-label export, UNet inference.

File-in/file-out (TIFF), glob-driven — the same surface as reference
prob_utils/my_predictions/ (punet_predictions.py, unet_predictions.py) with
the compute moved fully on-device:

  punet_prediction        — tiled (384^2 blocks, 64-px halo) MC-N mean-prob
                            maps per image (reference punet_predictions.py:15-63)
  punet_pseudo_prediction — full-image MC-N pseudo-label + consensus export
                            into annotations/<split>/<name>/ and
                            consensus/<split>/<name>/ trees (reference :66-136)
  unet_prediction         — tiled or padded deterministic UNet inference
                            (reference unet_predictions.py:12-43)

Per distinct image geometry the whole pipeline (tile gather -> per-tile
standardize -> MC-N forward with shared features -> consensus -> stitch)
compiles to ONE XLA program; the only host work is TIFF IO.
"""

from __future__ import annotations

import os
from functools import partial
from glob import glob
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.consensus import consensus_from_logits
from ..models.punet import mc_decode_logits
from .tiling import (
    extract_tiles,
    pad_to_divisible,
    stitch_tiles,
    tile_standardize,
)

BLOCK_SHAPE = (384, 384)  # reference punet_predictions.py:44
HALO = (64, 64)  # reference punet_predictions.py:45


def _read_image(path: str) -> np.ndarray:
    import imageio.v3 as imageio

    img = np.asarray(imageio.imread(path)).astype(np.float32)
    if img.ndim == 3:  # RGB(A) -> first channel (reference data is grayscale)
        img = img[..., 0]
    return img


_IMAGE_EXTS = (".tif", ".tiff", ".png", ".bmp")


def _glob_images(pattern: str):
    """Glob input images, expanding any matched DIRECTORY to its images.

    LIVECell-style layouts put images in per-cell-type subfolders, so a
    pattern like ``.../livecell_test_images/BT474*`` matches the folder
    itself; the reference's flat globs share this assumption."""
    paths = []
    for p in sorted(glob(pattern)):
        if os.path.isdir(p):
            paths.extend(
                sorted(
                    q
                    for q in glob(os.path.join(p, "*"))
                    if q.lower().endswith(_IMAGE_EXTS)
                )
            )
        else:
            paths.append(p)
    return paths


def _stem(filename: str) -> str:
    return os.path.splitext(filename)[0]


def _write_tiff(path: str, data: np.ndarray):
    import imageio.v3 as imageio

    imageio.imwrite(path, np.ascontiguousarray(data))


def _infer_shard_map(mesh) -> bool:
    """Use manual SPMD (``jax.shard_map``) for mesh-sharded inference?

    True on any multi-device 1-D mesh unless ``PDA_DP_IMPL=gspmd`` — the
    training-side rule (engine.Trainer._dp_shard_map). The point on TPU:
    each shard's body sees concrete per-shard tile shapes, so the fused
    Pallas conv kernels run under tile parallelism instead of being pinned
    off (GSPMD treats the custom calls as opaque and would replicate their
    operands). The result is passed into the jitted predictor as a STATIC
    argument (an env read inside the traced body would not participate in
    the jit cache key)."""
    return (
        mesh is not None
        and mesh.devices.size > 1
        and len(mesh.axis_names) == 1
        and os.environ.get("PDA_DP_IMPL", "shard_map") != "gspmd"
    )


def _tiled_punet_probs(model, params, image, key, n_samples, block, halo,
                       mesh=None, shard_map=None):
    """Non-jitted entry: resolves the ``shard_map=None`` default from the
    environment HERE, outside the trace, so the choice participates in the
    jit cache key (an env read inside the traced body would be baked in by
    the first call and silently ignored afterwards)."""
    if shard_map is None:
        shard_map = _infer_shard_map(mesh)
    return _tiled_punet_probs_jit(
        model, params, image, key, n_samples, block, halo, mesh, shard_map
    )


@partial(
    jax.jit,
    static_argnames=("model", "n_samples", "block", "halo", "mesh", "shard_map"),
)
def _tiled_punet_probs_jit(model, params, image, key, n_samples, block, halo,
                           mesh=None, shard_map=False):
    """Full-frame mean MC probability map via the on-device tile pipeline.

    Under a ``mesh`` the tile batch is padded to a multiple of the device
    count and partitioned over the devices — the spatial analog of context
    parallelism for this conv workload (SURVEY.md section 5.7). Two
    implementations:

      * manual SPMD (default on a 1-D mesh, ``_infer_shard_map``): the
        encode -> MC-decode -> mean body runs inside ``jax.shard_map`` on
        each shard's tile block with the fused Pallas kernels ALIVE; the
        latent draws come from the global-batch noise slice
        (``sharded_normal``), so the result is bit-identical to the
        single-device program WHEN the tile count divides the mesh (no
        padding). With padding the noise tensor's shape differs from the
        unpadded single-device draw, so the counter-based PRNG yields
        different (equally valid) samples — statistically equivalent,
        not bitwise.
      * GSPMD (2-D meshes / ``PDA_DP_IMPL=gspmd``): an explicit sharding
        constraint on the tile batch. The constraint matters: with
        replicated params and an unconstrained tile batch, GSPMD replicates
        the whole batch and every device redundantly computes all tiles
        (verified on an 8-device mesh). This path requires the plain XLA
        conv path (the caller pins it — the Pallas custom calls are opaque
        to the partitioner)."""
    tiles = tile_standardize(extract_tiles(image, block, halo))
    n_tiles = tiles.shape[0]

    def _mc_mean(params, tiles, key, axis_name=None):
        enc = model.apply({"params": params}, tiles, method="encode")
        logits = mc_decode_logits(
            model, params, enc.features, enc.prior, key, n_samples,
            axis_name=axis_name,
        )
        return jnp.mean(jax.nn.sigmoid(logits), axis=0)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        pad = (-n_tiles) % mesh.devices.size
        if pad:
            tiles = jnp.concatenate(
                [tiles, jnp.zeros((pad, *tiles.shape[1:]), tiles.dtype)], axis=0
            )
        if shard_map:
            axis = mesh.axis_names[0]
            probs = jax.shard_map(
                partial(_mc_mean, axis_name=axis),
                mesh=mesh,
                in_specs=(P(), P(axis), P()),
                out_specs=P(axis),
                check_vma=False,
            )(params, tiles, key)
            probs = probs[:n_tiles]
            return stitch_tiles(probs, image.shape[:2], block, halo)
        tiles = jax.lax.with_sharding_constraint(
            tiles, NamedSharding(mesh, P(mesh.axis_names, None, None, None))
        )
    probs = _mc_mean(params, tiles, key)[:n_tiles]
    return stitch_tiles(probs, image.shape[:2], block, halo)


@partial(jax.jit, static_argnames=("model", "n_samples", "masking"))
def _full_punet_pseudo(model, params, image, key, n_samples, masking):
    """Whole-image (padded) MC pseudo-label + consensus — the reference's
    untiled pseudo-labeling path (punet_predictions.py:96-124)."""
    mean = jnp.mean(image)
    std = jnp.std(image - mean)
    norm = (image - mean) / (std + 1e-7)
    padded, (h, w) = pad_to_divisible(norm, (16, 16))
    x = padded[None]
    enc = model.apply({"params": params}, x, method="encode")
    logits = mc_decode_logits(model, params, enc.features, enc.prior, key, n_samples)
    pseudo, consensus = consensus_from_logits(logits, masking=masking)
    return pseudo[0, :h, :w], consensus[0, :h, :w]


@partial(jax.jit, static_argnames=("model", "block", "halo"))
def _tiled_unet_probs(model, params, image, block, halo):
    tiles = tile_standardize(extract_tiles(image, block, halo))
    probs = model.apply({"params": params}, tiles)
    return stitch_tiles(probs, image.shape[:2], block, halo)


@partial(jax.jit, static_argnames=("model",))
def _padded_unet_probs(model, params, image):
    mean = jnp.mean(image)
    std = jnp.std(image - mean)
    norm = (image - mean) / (std + 1e-7)
    padded, (h, w) = pad_to_divisible(norm, (16, 16))
    probs = model.apply({"params": params}, padded[None])
    return probs[0, :h, :w]


def punet_prediction(
    input_image_path: str,
    output_pred_path: str,
    model,
    params,
    *,
    prior_samples: int = 8,
    block_shape: Tuple[int, int] = BLOCK_SHAPE,
    halo: Tuple[int, int] = HALO,
    seed: int = 0,
    mesh=None,
    verbose: bool = True,
):
    """Glob input images -> per image tiled MC-mean probability TIFF.

    Reference: punet_prediction (punet_predictions.py:15-63). Passing a
    ``jax.sharding.Mesh`` shards the tile batch over its devices (spatially
    parallel inference over ICI): via ``jax.shard_map`` on 1-D meshes (the
    fused Pallas kernels stay alive per shard) or GSPMD otherwise (plain
    XLA convs — the partitioner cannot split the opaque custom calls).
    """
    from contextlib import nullcontext

    os.makedirs(output_pred_path, exist_ok=True)
    pin = nullcontext()
    use_shard_map = _infer_shard_map(mesh)
    if mesh is not None:
        from ..parallel.mesh import replicated

        params = jax.device_put(params, replicated(mesh))
        if mesh.devices.size > 1 and not use_shard_map:
            from ..models.blocks import force_xla_conv_path

            # the fused Pallas conv kernels are opaque to GSPMD — trace with
            # XLA convs so the tile-batch sharding constraint actually splits
            # work across the mesh instead of replicating it
            pin = force_xla_conv_path(
                "note: GSPMD mesh-sharded inference forces the XLA conv "
                "path; PDA_PALLAS_CONV=1 is ignored here"
            )
    key = jax.random.PRNGKey(seed)
    with pin:
        for img_path in _glob_images(input_image_path):
            img_name = os.path.basename(img_path)
            img = _read_image(img_path)[..., None]
            key, sub = jax.random.split(key)
            pred = _tiled_punet_probs(
                model, params, jnp.asarray(img), sub, prior_samples,
                block_shape, halo, mesh, shard_map=use_shard_map,
            )
            out = os.path.join(output_pred_path, f"{_stem(img_name)}.tif")
            _write_tiff(out, np.asarray(pred)[..., 0].astype(np.float32))
            if verbose:
                print(f"Saved image at '{out}'")


def punet_pseudo_prediction(
    input_image_path: str,
    output_pred_path: str,
    model,
    params,
    *,
    prior_samples: int = 8,
    cellname: Optional[str] = None,
    split_name: Optional[str] = None,
    seed: int = 0,
    verbose: bool = True,
):
    """Pseudo-label + consensus factory for target training.

    Writes float pseudo-labels to ``annotations/<split>/<cell>/`` and binary
    consensus masks to ``consensus/<split>/<cell>/`` — the directory contract
    the consensus-aware datasets ingest (reference punet_predictions.py:66-136,
    my_livecell.py:181-185). The consensus is binarized (unanimity) exactly as
    the reference does for the file-export path (:124).
    """
    from ..utils import clean_folder

    os.makedirs(output_pred_path, exist_ok=True)
    key = jax.random.PRNGKey(seed)
    # LIVECell stores images in per-cell-type subfolders; the reference's
    # flat glob (punet_predictions.py:94) only matches the legacy layout.
    # Support both.
    if cellname and os.path.isdir(os.path.join(input_image_path, cellname)):
        pattern = os.path.join(input_image_path, cellname, f"{cellname}*.tif")
    else:
        pattern = os.path.join(input_image_path, f"{cellname or ''}*.tif")
    image_paths = sorted(glob(pattern))
    if not image_paths:
        # fail BEFORE clean_folder wipes prior exports: an empty glob here
        # (wrong layout / wrong cellname) would otherwise silently leave an
        # empty pseudo-label tree for downstream target training
        raise FileNotFoundError(
            f"no input images match {pattern!r} — nothing to pseudo-label"
        )
    dir1 = os.path.join(output_pred_path, "annotations", split_name or "", cellname or "")
    dir2 = os.path.join(output_pred_path, "consensus", split_name or "", cellname or "")
    os.makedirs(dir1, exist_ok=True)
    os.makedirs(dir2, exist_ok=True)
    # avoid stale exports from previous runs (reference punet_predictions.py:85)
    clean_folder(dir1)
    clean_folder(dir2)

    for img_path in image_paths:
        img_name = os.path.basename(img_path)
        img = _read_image(img_path)[..., None]
        key, sub = jax.random.split(key)
        pseudo, consensus = _full_punet_pseudo(
            model, params, jnp.asarray(img), sub, prior_samples, True
        )
        _write_tiff(os.path.join(dir1, img_name), np.asarray(pseudo)[..., 0])
        _write_tiff(
            os.path.join(dir2, img_name),
            np.asarray(consensus)[..., 0].astype("uint8"),
        )
        if verbose:
            print(f"{img_name}'s predictions saved")


def unet_prediction(
    input_path: str,
    output_path: str,
    model,
    params,
    *,
    tiling: bool = True,
    block_shape: Tuple[int, int] = BLOCK_SHAPE,
    halo: Tuple[int, int] = HALO,
    verbose: bool = True,
):
    """Deterministic UNet inference, tiled or padded
    (reference unet_predictions.py:12-43)."""
    os.makedirs(output_path, exist_ok=True)
    for img_path in _glob_images(input_path):
        img_name = os.path.basename(img_path)
        img = jnp.asarray(_read_image(img_path)[..., None])
        if tiling:
            pred = _tiled_unet_probs(model, params, img, block_shape, halo)
        else:
            pred = _padded_unet_probs(model, params, img)
        out = os.path.join(output_path, f"{_stem(img_name)}.tif")
        _write_tiff(out, np.asarray(pred)[..., 0].astype(np.float32))
        if verbose:
            print(f"Saved image at '{out}'")
