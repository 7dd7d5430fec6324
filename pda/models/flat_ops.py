"""Flat-canvas activation layout: inter-block ops that never leave it.

The fused Pallas ConvBlock kernels (pda.kernels.conv_block*) stream
margin-0 "flat" activations — (B, H*wp, C) row-major images with zero ring
columns (wp = canvas_wp(W), valid cols [MARGIN, MARGIN+W)), or the
lane-PACKED twin (B, H*wpp, 2C) where adjacent column pairs share one
128-lane row. Round-1 kept the network's tensors in image layout and
converted at every block edge; the canvas/uncanvas glue (pads, copies,
reshapes, scope fusions) measured ~35% of the 512^2 MT train step.

This module provides the between-block operators ON the flat layouts so a
whole PUNet forward/backward runs flat end-to-end (image layout only at the
network input and the Fcomb feature boundary):

  * to_flat / from_flat (+ packed twins) — the only conversions left;
  * pool_flat / pool_flat_packed — 2x2/stride-2 average pool, flat-to-flat
    (the packed variant folds the column-pair reduction into a lane-half
    add);
  * upsample_flat / upsample_flat_to_packed — x2 bilinear align-corners as
    two dense MXU contractions whose W-matrix reads/writes the flat's valid
    columns directly (ring columns get exact zeros, preserving the zero-ring
    contract the kernels rely on);
  * concat_flat / concat_packed_pair — channel concat (the packed pair
    variant interleaves even/odd lane halves);
  * mean_flat — global spatial mean (ring columns are zero, so a plain sum
    over the flat divided by H*W is exact).

Every op is linear or a static-slice/pad, so JAX autodiff produces
flat-to-flat transposes — cotangents inherit the zero-ring property
structurally (transposed matrices have zero rows at ring columns).

Reference semantics: AvgPool2d downsampling (unet_blocks.py:17),
bilinear align-corners upsampling (unet_blocks.py:51), skip concatenation
(unet.py:36-44), global-mean encoder head (probabilistic_unet.py:126-127).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..kernels.conv_block import MARGIN, canvas_wp, flat_m0, uncanvas
from ..kernels.conv_block_packed import packed_wpp, uncanvas_packed
from ..kernels.conv_block_packed_bwd import flat_m0 as flat_m0_packed
from .blocks import _upsample_matrix


def to_flat(x: jax.Array) -> jax.Array:
    """(B, H, W, C) image -> margin-0 flat (B, H*wp, C)."""
    return flat_m0(x, canvas_wp(x.shape[2]))


def to_flat_packed(x: jax.Array) -> jax.Array:
    """(B, H, W, C) image -> margin-0 packed flat (B, H*wpp, 2C)."""
    return flat_m0_packed(x, packed_wpp(x.shape[2]))


def block_diag2(w: jax.Array) -> jax.Array:
    """(Ci, Co) -> (2Ci, 2Co) block-diagonal [[W, 0], [0, W]]: applies a 1x1
    conv independently to the two positions of a lane-packed row (shared by
    the flat Fcomb decode and the fused MC-consensus kernel)."""
    z = jnp.zeros_like(w)
    return jnp.concatenate(
        [jnp.concatenate([w, z], axis=1), jnp.concatenate([z, w], axis=1)],
        axis=0,
    )


def from_flat(xf: jax.Array, h: int, w: int) -> jax.Array:
    return uncanvas(xf, h, w)


def from_flat_packed(xf: jax.Array, h: int, w: int) -> jax.Array:
    # A matmul-formulated unpack (two one-hot MXU contractions instead of
    # the lane-pair reshape) was probed in round 3/4 and measured a wash
    # (28.67 vs 28.64 patches/s); the knob was pruned in round 5 — the
    # measured record lives in IMPLEMENTATION_STATUS.md.
    return uncanvas_packed(xf, h, w)


def _place_cols(p: jax.Array, w2: int, wp2: int, src_off: int) -> jax.Array:
    """Take the pooled/valid columns [src_off, src_off+w2) of ``p`` and place
    them at [MARGIN, MARGIN+w2) of a wp2-wide zero canvas (exact-zero ring)."""
    core = p[:, :, src_off : src_off + w2, :]
    return jnp.pad(
        core, ((0, 0), (0, 0), (MARGIN, wp2 - MARGIN - w2), (0, 0))
    )


def _pool_mm_enabled() -> bool:
    """Matmul-formulated column pooling (default ON): columns + canvas
    placement run as one MXU contraction whose transpose is a matmul —
    measured +1.5% step throughput over the reshape-sum + pad form
    (28.67 vs 28.26 patches/s mean over repeated runs at the bench
    config). PDA_POOL_MM=0 restores the reduce/pad path."""
    import os

    return os.environ.get("PDA_POOL_MM", "1") != "0"


@functools.lru_cache(maxsize=None)
def _pool_placement_packed(w: int) -> np.ndarray:
    """(wp2, wpp) placement permutation for the packed pool: pooled packed
    col (MARGIN//2 + j) -> canvas col (MARGIN + j); exact zeros elsewhere."""
    wpp, wp2 = packed_wpp(w), canvas_wp(w // 2)
    m = np.zeros((wp2, wpp), np.float32)
    for j in range(w // 2):
        m[MARGIN + j, MARGIN // 2 + j] = 1.0
    return m


@functools.lru_cache(maxsize=None)
def _pool_w_flat(w: int) -> np.ndarray:
    """(wp2, wp) column-pair average matrix with canvas placement baked in:
    pooled canvas col (MARGIN + j) = 0.25 * (in[MARGIN + 2j] +
    in[MARGIN + 2j + 1]); everything else exact zero."""
    wp, wp2 = canvas_wp(w), canvas_wp(w // 2)
    m = np.zeros((wp2, wp), np.float32)
    for j in range(w // 2):
        m[MARGIN + j, MARGIN + 2 * j] = 0.25
        m[MARGIN + j, MARGIN + 2 * j + 1] = 0.25
    return m


def pool_flat(xf: jax.Array, h: int, w: int) -> jax.Array:
    """2x2/stride-2 average pool, flat (H, w) -> flat (H/2, w/2)."""
    b, _, c = xf.shape
    wp = canvas_wp(w)
    wp2 = canvas_wp(w // 2)
    # reshape-sum pool over (rows, flat col pairs); valid pairs stay aligned
    # because MARGIN and W are even. Pooled col j lands at input col pair
    # (2j, 2j+1) => valid pooled cols start at MARGIN/2. (A reduce_window
    # with a generic `add` computation has no autodiff rule.) The reduction
    # must be an axis-sum, NOT four explicit slices: reduce_sum's transpose
    # is ONE broadcast, while sliced adds transpose into four full-tensor
    # pad+add passes (measured ~1.5 ms/step of pure layout traffic).
    if _pool_mm_enabled():
        # experimental matmul-formulated column pool (upsample_flat's
        # pattern): rows via a contiguous pair-sum, columns + canvas
        # placement as ONE (wp2, wp) MXU contraction whose transpose is a
        # matmul rather than a broadcast+pad chain. Step-level A/B decides.
        x5 = xf.reshape(b, h // 2, 2, wp, c)
        rows = jnp.sum(x5, axis=2)
        pm = jnp.asarray(_pool_w_flat(w), xf.dtype)
        out = jnp.einsum("Ww,bhwc->bhWc", pm, rows,
                         precision=_precision_for(xf.dtype))
        return out.reshape(b, (h // 2) * wp2, c)
    x6 = xf.reshape(b, h // 2, 2, wp // 2, 2, c)
    p = jnp.sum(x6, axis=(2, 4)) * jnp.asarray(0.25, xf.dtype)
    out = _place_cols(p, w // 2, wp2, MARGIN // 2)
    return out.reshape(b, (h // 2) * wp2, c)


def pool_flat_packed(xf: jax.Array, h: int, w: int) -> jax.Array:
    """2x2/stride-2 average pool from a PACKED flat (H, w) to the UNPACKED
    flat (H/2, w/2): the column-pair reduction is a lane-half add (packed
    col j holds image cols (2j - MARGIN, 2j - MARGIN + 1))."""
    b, _, c2 = xf.shape
    c = c2 // 2
    wpp = packed_wpp(w)
    wp2 = canvas_wp(w // 2)
    x4 = xf.reshape(b, h // 2, 2, wpp, c2)
    rows = jnp.sum(x4, axis=2)  # axis-sum: transpose is a broadcast (above)
    lanes = rows[..., :c] + rows[..., c:]
    p = lanes * jnp.asarray(0.25, xf.dtype)
    if _pool_mm_enabled():
        # column placement as an MXU permutation (see _pool_mm_enabled)
        pm = jnp.asarray(_pool_placement_packed(w), xf.dtype)
        out = jnp.einsum("Ww,bhwc->bhWc", pm, p,
                         precision=_precision_for(xf.dtype))
        return out.reshape(b, (h // 2) * wp2, c)
    # pooled col j sits at packed col j + MARGIN/2
    out = _place_cols(p, w // 2, wp2, MARGIN // 2)
    return out.reshape(b, (h // 2) * wp2, c)


@functools.lru_cache(maxsize=None)
def _up_w_flat(w: int) -> np.ndarray:
    """(wp2, wp) align-corners x2 interpolation matrix acting on flat
    columns: rows/cols outside the valid windows are exact zeros."""
    m = _upsample_matrix(w)  # (2w, w)
    wp, wp2 = canvas_wp(w), canvas_wp(2 * w)
    out = np.zeros((wp2, wp), np.float32)
    out[MARGIN : MARGIN + 2 * w, MARGIN : MARGIN + w] = m
    return out


@functools.lru_cache(maxsize=None)
def _up_w_packed(w: int):
    """(wpp2, wp) even/odd matrices mapping a flat's columns to the PACKED
    x2 flat: packed col j's lane halves hold image cols (2j - M, 2j - M + 1)
    => even half = upsampled col 2j - M, odd half = col 2j - M + 1."""
    m = _upsample_matrix(w)  # (2w, w)
    wp = canvas_wp(w)
    wpp2 = packed_wpp(2 * w)
    even = np.zeros((wpp2, wp), np.float32)
    odd = np.zeros((wpp2, wp), np.float32)
    for j in range(wpp2):
        for k, mat in ((0, even), (1, odd)):
            ic = 2 * j + k - MARGIN
            if 0 <= ic < 2 * w:
                mat[j, MARGIN : MARGIN + w] = m[ic]
    return even, odd


def _precision_for(dtype):
    return jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None


def upsample_flat(xf: jax.Array, h: int, w: int) -> jax.Array:
    """Bilinear x2 align-corners upsample, flat (h, w) -> flat (2h, 2w)."""
    b, _, c = xf.shape
    wp = canvas_wp(w)
    x4 = xf.reshape(b, h, wp, c)
    prec = _precision_for(xf.dtype)
    mh = jnp.asarray(_upsample_matrix(h), xf.dtype)
    mw = jnp.asarray(_up_w_flat(w), xf.dtype)
    x4 = jnp.einsum("Hh,bhwc->bHwc", mh, x4, precision=prec)
    x4 = jnp.einsum("Ww,bhwc->bhWc", mw, x4, precision=prec)
    return x4.reshape(b, 2 * h * canvas_wp(2 * w), c)


def upsample_flat_to_packed(xf: jax.Array, h: int, w: int) -> jax.Array:
    """Bilinear x2 align-corners upsample, flat (h, w) -> PACKED flat
    (2h, 2w): the two even/odd W-contraction streams, lane-concatenated."""
    ue, uo = upsample_flat_packed_parts(xf, h, w)
    return jnp.concatenate([ue, uo], axis=-1)


def upsample_flat_packed_parts(xf: jax.Array, h: int, w: int):
    """The even/odd lane-half streams of :func:`upsample_flat_to_packed`,
    kept SEPARATE (each (B, 2h*wpp2, C)) for the triple-input decoder kernel
    — the packed upsample tensor is never lane-concatenated in HBM."""
    b, _, c = xf.shape
    wp = canvas_wp(w)
    x4 = xf.reshape(b, h, wp, c)
    prec = _precision_for(xf.dtype)
    mh = jnp.asarray(_upsample_matrix(h), xf.dtype)
    even_np, odd_np = _up_w_packed(w)
    x4 = jnp.einsum("Hh,bhwc->bHwc", mh, x4, precision=prec)
    wpp2 = packed_wpp(2 * w)
    ue = jnp.einsum("Jw,bhwc->bhJc", jnp.asarray(even_np, xf.dtype), x4,
                    precision=prec)
    uo = jnp.einsum("Jw,bhwc->bhJc", jnp.asarray(odd_np, xf.dtype), x4,
                    precision=prec)
    return ue.reshape(b, 2 * h * wpp2, c), uo.reshape(b, 2 * h * wpp2, c)


def concat_flat(a: jax.Array, b: jax.Array) -> jax.Array:
    """Channel concat of two unpacked flats sharing one geometry."""
    return jnp.concatenate([a, b], axis=-1)


def concat_packed_pair(up: jax.Array, skip: jax.Array, cu: int, cs: int):
    """Channel concat of two PACKED flats: interleave even/odd lane halves
    so the result is the packed flat of concat([up, skip], channels)."""
    return jnp.concatenate(
        [up[..., :cu], skip[..., :cs], up[..., cu:], skip[..., cs:]], axis=-1
    )


def mean_flat(xf: jax.Array, h: int, w: int) -> jax.Array:
    """Global spatial mean of an UNPACKED flat (B, H*wp, C) -> (B, C): ring
    columns are zero, so sum over the whole flat / (H*W) is exact. For a
    PACKED flat use :func:`mean_flat_packed` — applying this to one would
    return per-lane-half sums of shape (B, 2C), not the mean."""
    s = jnp.sum(xf, axis=1)
    return s / jnp.asarray(h * w, s.dtype)


def mean_flat_packed(xf: jax.Array, h: int, w: int, c: int) -> jax.Array:
    """Global spatial mean of a PACKED flat (B, H*wpp, 2C) -> (B, C): the
    lane halves are the even/odd column groups of the same image, so they
    sum before the single H*W division."""
    s = jnp.sum(xf, axis=1)
    return (s[:, :c] + s[:, c:]) / jnp.asarray(h * w, s.dtype)


def module_flat_plan(x, num_filters, n_convs_per_block: int, *, with_decoder: bool):
    """Shared eligibility gate for the flat activation pipeline — used by
    both PUNetBackbone and GaussianEncoder so their gating can never drift
    (None = take the image path). Only eligible on TPU with the Pallas
    kernels enabled and the 3-conv block shape the kernels serve."""
    from .blocks import pallas_conv_enabled, space_axis

    if n_convs_per_block != 3 or not pallas_conv_enabled():
        return None
    if space_axis() is not None:
        # row-sharded shard_map: blocks run the IMAGE-mode kernels with
        # explicit halo exchange (blocks._conv3_space_sharded); the flat
        # pipeline's canvas layouts are not halo-aware
        return None
    b, h, w, cin = x.shape
    return flat_pipeline_plan(h, w, cin, num_filters, with_decoder=with_decoder)


def flat_pipeline_plan(h: int, w: int, cin: int, filters, *, with_decoder: bool):
    """Decide whether a whole conv pyramid (and optionally the UNet decoder)
    can run flat end-to-end at this geometry, and which levels use the
    lane-packed layout.

    Returns None when any level is ineligible (callers fall back to the
    image-layout path), else a dict:
      ``l0_packed``  — level-0 blocks (and the network-entry flat) packed;
      ``dec_packed`` — the last decoder block packed (consumes the packed
                       level-0 skip), only with ``with_decoder``.
    """
    from .blocks import flat_block_eligible, packed_flat_eligible

    depth = len(filters)
    if h % (2 ** (depth - 1)) or w % (2 ** (depth - 1)):
        return None
    hs = [h >> i for i in range(depth)]
    ws = [w >> i for i in range(depth)]
    cins = [cin] + list(filters[:-1])
    for i in range(depth):
        if not flat_block_eligible(hs[i], ws[i], cins[i], filters[i]):
            return None
    l0_packed = packed_flat_eligible(h, w, cin, filters[0])
    dec_packed = False
    if with_decoder and depth > 1:
        for i in range(depth - 2, -1, -1):
            cdec = filters[i + 1] + filters[i]
            if not flat_block_eligible(hs[i], ws[i], cdec, filters[i]):
                return None
        dec_packed = packed_flat_eligible(
            h, w, filters[1] + filters[0], filters[0]
        )
        # the packed decoder consumes the packed level-0 skip: the two
        # choices must agree, else fall back to unpacked for both
        l0_packed = dec_packed = l0_packed and dec_packed
    return {"l0_packed": l0_packed, "dec_packed": dec_packed}
