"""Shared conv building blocks for the PUNet family — flax.linen, NHWC.

TPU-native counterparts of reference prob_utils/my_models/unet_blocks.py and
the Encoder conv pyramid (probabilistic_unet.py:18-69). Layout is channel-last
(NHWC) so XLA tiles the convolutions onto the MXU directly; the reference's
NCHW is a GPU convention we do not copy.

Initialization follows the reference (my_models/utils.py:17-28):
  * conv kernels: Kaiming/He normal, fan_in, relu gain
  * biases: truncated normal (|z| < 2) with sigma = 1e-3
  * fcomb / gaussian-head kernels: orthogonal (gain 1)
"""

from __future__ import annotations

import functools
import os
from contextlib import contextmanager
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# He-normal fan-in, untruncated — matches torch kaiming_normal_(mode="fan_in",
# nonlinearity="relu") (reference my_models/utils.py:19).
he_normal = nn.initializers.variance_scaling(2.0, "fan_in", "normal")
orthogonal = nn.initializers.orthogonal()


def trunc_normal_bias(std: float = 1e-3):
    """Truncated normal (resampled within 2 sigma) bias init.

    Matches reference ``truncated_normal_`` (my_models/utils.py:8-14).
    """

    def init(key, shape, dtype=jnp.float32):
        return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)

    return init


def avg_pool_2x2(x: jax.Array) -> jax.Array:
    """2x2/stride-2 average pool (reference AvgPool2d, unet_blocks.py:17).

    Spatial dims must be even — the framework pads inputs to a
    divisible-by-2^depth grid instead of relying on torch's ceil_mode, keeping
    all shapes static for XLA.
    """
    assert x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0, (
        f"avg_pool_2x2 needs even spatial dims, got {x.shape}"
    )
    return nn.avg_pool(x, (2, 2), strides=(2, 2))


def _upsample_indices(n: int):
    """Gather indices + weights for x2 linear upsampling with align_corners=True."""
    t = np.arange(2 * n) * ((n - 1) / (2 * n - 1))
    lo = np.floor(t).astype(np.int32)
    hi = np.minimum(lo + 1, n - 1)
    frac = (t - lo).astype(np.float32)
    return lo, hi, frac


@functools.lru_cache(maxsize=None)
def _upsample_matrix(n: int) -> np.ndarray:
    """(2n, n) align-corners bilinear interpolation matrix: row t holds the
    two lerp weights (1-frac, frac) at columns (lo, hi)."""
    lo, hi, frac = _upsample_indices(n)
    mat = np.zeros((2 * n, n), np.float32)
    np.add.at(mat, (np.arange(2 * n), lo), 1.0 - frac)
    np.add.at(mat, (np.arange(2 * n), hi), frac)
    return mat


def upsample_2x_align_corners(x: jax.Array) -> jax.Array:
    """Bilinear x2 upsampling with align_corners=True semantics, NHWC.

    Matches torch ``F.interpolate(mode="bilinear", scale_factor=2,
    align_corners=True)`` (reference unet_blocks.py:51). jax.image.resize uses
    half-pixel centers (align_corners=False), so this applies a static (2n, n)
    interpolation matrix per spatial axis as two dense contractions — the lerp
    lives on the MXU (where a TPU wants it) and, unlike a gather formulation,
    the backward pass is another pair of matmuls instead of scatter-adds
    (measured 4.6x faster fwd+bwd at the 256->512 decoder level on v5e).

    Precision: for sub-f32 inputs the matmul runs in the input dtype (same
    rounding class as the previous lerp); for f32 it uses HIGHEST precision so
    parity with the reference's f32 lerp holds to float epsilon.
    """
    _, h, w, _ = x.shape
    wh = jnp.asarray(_upsample_matrix(h), x.dtype)
    ww = jnp.asarray(_upsample_matrix(w), x.dtype)
    precision = (
        jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else None
    )
    x = jnp.einsum("Hh,bhwc->bHwc", wh, x, precision=precision)
    x = jnp.einsum("Ww,bhwc->bhWc", ww, x, precision=precision)
    return x


# ---------------------------------------------------------------------------
# Fused conv-chain with a hand-written VJP.
#
# XLA's autodiff backward for chained SAME convs is the dominant cost of the
# PUNet train step on TPU: the weight gradient lowers to conv-formulated
# contractions with relayout copies around every saved activation (measured:
# the 512^2 MT step spent 98 ms in backward vs 24 ms forward, with wgrad
# alone ~62 ms). This VJP keeps the forward as XLA convolutions (which are
# fast) and rewrites the backward as
#   * dgrad: SAME conv with the spatially-flipped, io-swapped kernel — the
#     same MXU-friendly convolution as the forward;
#   * wgrad: nine (dy, dx)-shifted dot_generals contracting over
#     (batch, H, W) — a huge-K matmul the MXU streams at high utilization
#     instead of XLA's conv-formulated weight gradient.
# Measured on v5e at the 512^2/64ch level-0 block: fwd+bwd 12.4 ms vs 19.1 ms
# autodiff (35% faster); grads agree with autodiff to 1e-4 relative.
# ---------------------------------------------------------------------------


def _conv_same(x: jax.Array, w: jax.Array) -> jax.Array:
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _dgrad(g: jax.Array, w: jax.Array) -> jax.Array:
    """Input gradient of a SAME 3x3 conv: conv with flipped, io-swapped kernel."""
    return _conv_same(g, jnp.flip(w, axis=(0, 1)).transpose(0, 1, 3, 2))


def _wgrad(x: jax.Array, g: jax.Array) -> jax.Array:
    """dW[dy, dx, ci, co] = sum_bhw x[b, h+dy-1, w+dx-1, ci] * g[b, h, w, co]."""
    b, h, wd, ci = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    rows = []
    for dy in range(3):
        cols = []
        for dx in range(3):
            xs = jax.lax.slice(xp, (0, dy, dx, 0), (b, dy + h, dx + wd, ci))
            cols.append(
                jax.lax.dot_general(
                    xs, g, (((0, 1, 2), (0, 1, 2)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            )
        rows.append(jnp.stack(cols))
    return jnp.stack(rows)


@jax.custom_vjp
def conv3_relu(x, w1, b1, w2, b2, w3, b3):
    """Three chained SAME conv3x3 + bias + relu layers (one ConvBlock body)."""
    h = x
    for w, b in ((w1, b1), (w2, b2), (w3, b3)):
        h = jnp.maximum(_conv_same(h, w) + b.astype(h.dtype), 0.0)
    return h


def _conv3_fwd(x, w1, b1, w2, b2, w3, b3):
    h1 = jnp.maximum(_conv_same(x, w1) + b1.astype(x.dtype), 0.0)
    h2 = jnp.maximum(_conv_same(h1, w2) + b2.astype(x.dtype), 0.0)
    h3 = jnp.maximum(_conv_same(h2, w3) + b3.astype(x.dtype), 0.0)
    return h3, (x, w1, w2, w3, h1, h2, h3)


def _conv3_bwd(res, g):
    x, w1, w2, w3, h1, h2, h3 = res

    def back(h_out, h_in, w, dout):
        da = jnp.where(h_out > 0, dout, 0).astype(h_out.dtype)
        dw = _wgrad(h_in, da)
        db = jnp.sum(da, axis=(0, 1, 2), dtype=jnp.float32)
        return _dgrad(da, w), dw, db

    dh2, dw3, db3 = back(h3, h2, w3, g)
    dh1, dw2, db2 = back(h2, h1, w2, dh2)
    dx, dw1, db1 = back(h1, x, w1, dh1)
    return dx, dw1, db1, dw2, db2, dw3, db3


conv3_relu.defvjp(_conv3_fwd, _conv3_bwd)


# ---------------------------------------------------------------------------
# Pallas path: whole-block fused forward AND backward kernels
# (pda.kernels.conv_block / conv_block_bwd). The forward streams each row
# band through VMEM once for all three convolutions; the backward fuses
# activation recompute + relu-masked dgrad chain + big-K wgrad partials per
# band. Numerics: same bf16 class as the XLA path (verified against f32
# ground truth — the deviation is relu-boundary bf16 noise both paths share).
# ---------------------------------------------------------------------------


def _fit_tile(h: int, rt: int) -> int:
    """Largest row tile <= rt (multiple of 8) that divides h; 0 if none."""
    while rt >= 8 and h % rt:
        rt //= 2
    return rt if rt >= 8 and h % rt == 0 else 0


def _fwd_row_tile(h: int, cin: int, c: int) -> int:
    """Row-band height for the forward kernel, sized to keep the band + f32
    stencil accumulator well inside VMEM at each PUNet geometry.
    ``PDA_RT_FWD`` overrides at every height. With the tail-carry pipeline
    (default) the per-band halo recompute is gone and 16-row tiles measure
    fastest (29.4-29.5 vs 28.6-28.8 patches/s at the bench config); the
    non-carry defaults keep the round-2/3 measured optimum."""
    override = int(os.environ.get("PDA_RT_FWD", "0"))
    if override:
        return _fit_tile(h, min(override, h))
    from ..kernels.conv_block import carry_enabled

    if carry_enabled():
        return _fit_tile(h, min(16, h))
    if h >= 512:
        return _fit_tile(h, 16 if max(cin, c) > 64 else 32)
    return _fit_tile(h, min(32, h))


def _bwd_row_tile(h: int, cin: int, c: int) -> int:
    """Backward kernel bands carry 3 input streams + wider f32 accumulators
    (3*max(cin,c) lanes), so tiles shrink faster with width/channels."""

    m = max(cin, c)
    if h >= 512:
        rt = (int(os.environ.get("PDA_RT_BWD512", "0"))
              or (16 if m <= 64 else 8))
    elif h == 256:
        rt = 32 if m <= 128 else 16
    elif h == 128:
        rt = (int(os.environ.get("PDA_RT_BWD128", "0"))
              or (32 if m <= 256 else 8))
    else:
        rt = min(16 if m > 256 else 32, h)
    return _fit_tile(h, rt)


@contextmanager
def force_xla_conv_path(note: str = ""):
    """Pin the plain XLA conv path (PDA_PALLAS_CONV=0) while tracing under a
    multi-device mesh: the fused Pallas kernels are opaque custom calls that
    XLA's SPMD partitioner cannot split (no custom_partitioning registered),
    so GSPMD would replicate their operands and every device would redundantly
    compute the full batch. Restores the caller's setting on exit."""

    prev = os.environ.get("PDA_PALLAS_CONV")
    if prev == "1" and note:
        print(note)
    os.environ["PDA_PALLAS_CONV"] = "0"
    try:
        yield
    finally:
        if prev is None:
            os.environ.pop("PDA_PALLAS_CONV", None)
        else:
            os.environ["PDA_PALLAS_CONV"] = prev


# ---------------------------------------------------------------------------
# Spatial (row) sharding under shard_map: explicit halo exchange.
#
# With image rows sharded over a mesh axis (manual SPMD via jax.shard_map),
# every 3-conv block extends its input with HALO rows from the neighboring
# shards via jax.lax.ppermute, runs the ordinary fused kernel on the extended
# rows, and crops — so the Pallas conv kernels stay alive per shard where the
# GSPMD partitioner would have to treat them as unsplittable opaque calls
# (SURVEY.md section 5.7; VERDICT r3 next-round item 4). The context below is
# read at TRACE time (like force_xla_conv_path) by ConvBlock / UpBlock /
# GaussianEncoder; the engine activates it while tracing steps on a
# (data, space) shard_map mesh.
# ---------------------------------------------------------------------------

_SPACE_AXIS: Optional[str] = None

#: rows exchanged per block edge. The 3-conv chain needs 3; 4 keeps the
#: extended height h_loc + 8 divisible by 8 for the kernel row tiles.
HALO = 4
#: rows whose fused-kernel output is wrong at a GLOBAL image boundary (the
#: zero halo there differs from per-layer zero padding once intermediates
#: propagate: h2 corrupt at distance 0, h3 at distance <= 1) — recomputed
#: exactly from a boundary strip and patched in. 3 leaves safety margin.
_EDGE_FIX = 3
#: strip height for the exact boundary recompute: outputs [0, _EDGE_FIX) of a
#: SAME-conv chain need input rows < _EDGE_FIX + 3 <= 8; 16 keeps the strip
#: itself row-tile friendly.
_EDGE_STRIP = 16


@contextmanager
def space_sharding(axis_name: str):
    """Declare that image rows (H of NHWC) are sharded over ``axis_name``
    inside the enclosing ``jax.shard_map``. Trace-time context."""
    global _SPACE_AXIS
    prev = _SPACE_AXIS
    _SPACE_AXIS = axis_name
    try:
        yield
    finally:
        _SPACE_AXIS = prev


def space_axis() -> Optional[str]:
    return _SPACE_AXIS


def _halo_exchange_rows(x: jax.Array, halo: int, axis_name: str) -> jax.Array:
    """Extend (B, h_loc, W, C) with ``halo`` rows from each row-neighbor.

    Boundary shards receive zeros (ppermute's semantics for unpaired
    devices) — the same values SAME-padding would supply, see the edge fix
    in :func:`_conv3_space_sharded`."""
    n = jax.lax.axis_size(axis_name)
    if n == 1:
        z = jnp.zeros_like(x[:, :halo])
        return jnp.concatenate([z, x, z], axis=1)
    fwd = [(i, i + 1) for i in range(n - 1)]
    bwd = [(i + 1, i) for i in range(n - 1)]
    prev_bot = jax.lax.ppermute(x[:, -halo:], axis_name, fwd)
    next_top = jax.lax.ppermute(x[:, :halo], axis_name, bwd)
    return jnp.concatenate([prev_bot, x, next_top], axis=1)


def _conv3_space_sharded(x: jax.Array, fn_for, weights, axis_name: str):
    """Run a 3-conv block on row-sharded x with explicit halo exchange.

    ``fn_for(h)`` picks the conv implementation for height ``h`` (the caller
    re-evaluates kernel eligibility at the extended height). The halo rows a
    GLOBAL-boundary shard receives are zeros, which matches SAME padding for
    the first conv but not for the deeper layers (their zero pad applies to
    INTERMEDIATES, which are nonzero over the fake region once a bias/input
    tap reaches in) — so the ``_EDGE_FIX`` rows nearest each global boundary
    are recomputed exactly from an in-shard strip (plain XLA convs, identical
    math at SAME-padded edges) and patched in on the first/last shard only.
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    ext = _halo_exchange_rows(x, HALO, axis_name)
    y = fn_for(ext.shape[1])(ext, *weights)[:, HALO:-HALO]
    # the strip must cover the fixed rows' receptive field (_EDGE_FIX + 3)
    # without its far-edge padding reaching back in
    strip = min(x.shape[1], _EDGE_STRIP)
    if strip < _EDGE_FIX + 6:
        raise ValueError(
            f"row shards of {x.shape[1]} rows are too small for the "
            f"boundary fix (need >= {_EDGE_FIX + 6}); use fewer 'space' "
            f"shards or larger images"
        )
    strip_fn = conv3_relu  # plain path: exact SAME-edge semantics
    top = strip_fn(x[:, :strip], *weights)[:, :_EDGE_FIX]
    bot = strip_fn(x[:, -strip:], *weights)[:, -_EDGE_FIX:]
    first = (idx == 0)
    last = (idx == n - 1)
    y = y.at[:, :_EDGE_FIX].set(
        jnp.where(first, top.astype(y.dtype), y[:, :_EDGE_FIX])
    )
    y = y.at[:, -_EDGE_FIX:].set(
        jnp.where(last, bot.astype(y.dtype), y[:, -_EDGE_FIX:])
    )
    return y


def upsample_2x_align_corners_sharded(x: jax.Array, axis_name: str) -> jax.Array:
    """Row-sharded align-corners x2 upsample (exact).

    Each shard's 2*h_loc output rows interpolate input rows
    [s*h_loc - 1, (s+1)*h_loc] — one row from each neighbor. The local
    interpolation weights are a dynamic row/col block of the SAME static
    (2H, H) matrix the single-device path uses (zero-padded by one column on
    each side so boundary shards address their zero halo row with zero
    weight), so values match the unsharded op bit-for-bit."""
    b, hl, w, c = x.shape
    n = jax.lax.axis_size(axis_name)
    s = jax.lax.axis_index(axis_name)
    H = hl * n
    if n == 1:
        return upsample_2x_align_corners(x)
    prev_last = jax.lax.ppermute(
        x[:, -1:], axis_name, [(i, i + 1) for i in range(n - 1)]
    )
    next_first = jax.lax.ppermute(
        x[:, :1], axis_name, [(i + 1, i) for i in range(n - 1)]
    )
    ext = jnp.concatenate([prev_last, x, next_first], axis=1)  # (b, hl+2, w, c)
    m_full = np.pad(_upsample_matrix(H), ((0, 0), (1, 1)))  # (2H, H+2)
    m_loc = jax.lax.dynamic_slice(
        jnp.asarray(m_full, x.dtype), (s * 2 * hl, s * hl), (2 * hl, hl + 2)
    )
    ww = jnp.asarray(_upsample_matrix(w), x.dtype)
    precision = (
        jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else None
    )
    x = jnp.einsum("Hh,bhwc->bHwc", m_loc, ext, precision=precision)
    return jnp.einsum("Ww,bhwc->bhWc", ww, x, precision=precision)


def global_mean_rows_sharded(x_mean_local: jax.Array, axis_name: str) -> jax.Array:
    """Global spatial mean over row shards — a REAL differentiated pmean.

    Unlike the losses' value-global/gradient-local ``_gsum`` trick (which
    serves terms consumed once per shard), the pooled Gaussian stats feed
    BOTH replicated consumers (the KL, the latent draw) and row-sharded
    consumers (the reconstruction via z): correctness requires the pooled
    value's cotangents to be GATHERED across row shards before flowing back
    into each shard's rows. ``pmean``'s transpose under shard_map's legacy
    (check_vma=False) rules is ``psum(ct)/n`` — exactly that gather. Each
    shard's conv gradients then carry <psum(ct)/n, d m_s/dθ>, and the outer
    gradient psum over ``space`` reassembles <ct, d(global mean)/dθ>
    exactly; replicated objective terms (the KL) must additionally scale
    their gradient by 1/n_space (``pda.core.losses.neg_elbo``) so the same
    psum counts them once. Pinned by
    tests/test_parallel.py::TestSpatialShardMap (full-step parameter
    equality); if a JAX upgrade changes the legacy psum transpose, those
    pins fail loudly."""
    return jax.lax.pmean(x_mean_local, axis_name)


def pallas_conv_enabled() -> bool:
    """Use the Pallas fused block kernels? Env override PDA_PALLAS_CONV=0/1,
    default: only on TPU backends (the kernels target Mosaic/v5e)."""

    flag = os.environ.get("PDA_PALLAS_CONV", "auto")
    if flag == "0":
        return False
    if flag == "1":
        return True
    try:
        # honor `with jax.default_device(cpu)` contexts (CPU param init)
        dev = jax.config.jax_default_device
        if dev is not None and getattr(dev, "platform", str(dev)) not in (
            "tpu", "axon",
        ):
            return False
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


@jax.custom_vjp
def conv3_relu_pallas(x, w1, b1, w2, b2, w3, b3):
    from ..kernels.conv_block import conv_block_fused

    rt = _fwd_row_tile(x.shape[1], x.shape[-1], w1.shape[-1])
    return conv_block_fused(x, w1, b1, w2, b2, w3, b3, row_tile=rt)


def _conv3p_fwd(x, w1, b1, w2, b2, w3, b3):
    from ..kernels.conv_block import (
        canvas_flat,
        canvas_wp,
        conv_block_fused_canvas,
        uncanvas,
    )

    h, w = x.shape[1], x.shape[2]
    rt = _fwd_row_tile(h, x.shape[-1], w1.shape[-1])
    xc = canvas_flat(x, canvas_wp(w))
    out_flat, h1_flat, h2_flat = conv_block_fused_canvas(
        xc, h, w, w1, b1, w2, b2, w3, b3, row_tile=rt, save_intermediates=True
    )
    # residuals carry the canvases + intermediates so the backward neither
    # rebuilds canvases nor recomputes h1/h2
    return uncanvas(out_flat, h, w), (
        xc, out_flat, h1_flat, h2_flat, (h, w), w1, b1, w2, b2, w3
    )


def _conv3p_bwd(res, g):
    from ..kernels.conv_block import canvas_flat, canvas_wp
    from ..kernels.conv_block_bwd import conv_block_bwd_canvas

    xc, out_flat, h1_flat, h2_flat, (h, w), w1, b1, w2, b2, w3 = res
    rt = _bwd_row_tile(h, xc.shape[-1], w1.shape[-1])
    gc = canvas_flat(g.astype(xc.dtype), canvas_wp(w))
    # out/h1/h2 flats stream into the backward as-is (canvas-free reads)
    dx, dw1, db1, dw2, db2, dw3, db3 = conv_block_bwd_canvas(
        xc, out_flat, gc, h, w, w1, b1, w2, b2, w3,
        h1f=h1_flat, h2f=h2_flat, row_tile=rt,
    )
    return dx, dw1, db1, dw2, db2, dw3, db3


conv3_relu_pallas.defvjp(_conv3p_fwd, _conv3p_bwd)


# ---------------------------------------------------------------------------
# Lane-PACKED Pallas path for the Cout=64 block geometries (level-0 blocks at
# 512^2 — the step's hottest tensors). Packs adjacent spatial-position pairs
# into full 128-lane rows: 2x MXU utilization for the (.., 64)-channel
# contractions and ~1.5x HBM streaming efficiency vs the 64-lane layout.
# See pda/kernels/conv_block_packed.py for the kernel design.
# ---------------------------------------------------------------------------


def _packed_fwd_row_tile(h: int, cin: int, c: int) -> int:
    override = int(os.environ.get("PDA_RT_PFWD", "0"))
    if override:
        return _fit_tile(h, min(override, h))
    from ..kernels.conv_block import carry_enabled

    if carry_enabled():
        return _fit_tile(h, min(16, h))
    if h >= 512:
        return _fit_tile(h, 16 if cin > 64 else 32)
    return _fit_tile(h, min(32, h))


def _packed_bwd_row_tile(h: int, cin: int, c: int) -> int:
    if h >= 512:
        rt = (int(os.environ.get("PDA_RT_PBWD512", "0"))
              or (8 if cin > 64 else 16))
        return _fit_tile(h, rt)
    return _fit_tile(h, min(16, h))


@jax.custom_vjp
def conv3_relu_packed(x, w1, b1, w2, b2, w3, b3):
    from ..kernels.conv_block_packed import conv_block_packed

    rt = _packed_fwd_row_tile(x.shape[1], x.shape[-1], w1.shape[-1])
    return conv_block_packed(x, w1, b1, w2, b2, w3, b3, row_tile=rt)


def _conv3pk_fwd(x, w1, b1, w2, b2, w3, b3):
    from ..kernels.conv_block_packed import (
        canvas_packed,
        conv_block_packed_canvas,
        packed_wpp,
        uncanvas_packed,
    )

    h, w = x.shape[1], x.shape[2]
    rt = _packed_fwd_row_tile(h, x.shape[-1], w1.shape[-1])
    xc = canvas_packed(x, packed_wpp(w))
    out_flat, h1_flat, h2_flat = conv_block_packed_canvas(
        xc, h, w, w1, b1, w2, b2, w3, b3, row_tile=rt, save_intermediates=True
    )
    return uncanvas_packed(out_flat, h, w), (
        xc, out_flat, h1_flat, h2_flat, (h, w), w1, b1, w2, b2, w3
    )


def _conv3pk_bwd(res, g):
    from ..kernels.conv_block_packed import canvas_packed, packed_wpp
    from ..kernels.conv_block_packed_bwd import conv_block_packed_bwd_canvas

    xc, out_flat, h1_flat, h2_flat, (h, w), w1, b1, w2, b2, w3 = res
    rt = _packed_bwd_row_tile(h, xc.shape[-1] // 2, w1.shape[-1])
    gc = canvas_packed(g.astype(xc.dtype), packed_wpp(w))
    # out/h1/h2 flats stream into the backward as-is (canvas-free reads)
    dx, dw1, db1, dw2, db2, dw3, db3 = conv_block_packed_bwd_canvas(
        xc, out_flat, gc, h1_flat, h2_flat,
        h, w, w1, w2, w3, row_tile=rt,
    )
    return dx, dw1, db1, dw2, db2, dw3, db3


conv3_relu_packed.defvjp(_conv3pk_fwd, _conv3pk_bwd)


# ---------------------------------------------------------------------------
# Flat-I/O VJP wrappers: input and output are margin-0 flat canvases (see
# pda/models/flat_ops.py). Used by the flat activation pipeline so that no
# canvas/uncanvas layout ops appear between blocks. h/w are static (the flat
# shape alone does not determine the image geometry).
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def conv3_relu_flat(h, w, xf, w1, b1, w2, b2, w3, b3):
    from ..kernels.conv_block import conv_block_fused_flat

    rt = _fwd_row_tile(h, xf.shape[-1], w1.shape[-1])
    return conv_block_fused_flat(
        xf, h, w, w1, b1, w2, b2, w3, b3, row_tile=rt
    )


def _conv3f_fwd(h, w, xf, w1, b1, w2, b2, w3, b3):
    from ..kernels.conv_block import conv_block_fused_flat

    rt = _fwd_row_tile(h, xf.shape[-1], w1.shape[-1])
    outf, h1f, h2f = conv_block_fused_flat(
        xf, h, w, w1, b1, w2, b2, w3, b3,
        row_tile=rt, save_intermediates=True,
    )
    return outf, (xf, outf, h1f, h2f, w1, b1, w2, b2, w3)


def _conv3f_bwd(h, w, res, g):
    from ..kernels.conv_block_bwd import conv_block_bwd_flat

    xf, outf, h1f, h2f, w1, b1, w2, b2, w3 = res
    rt = _bwd_row_tile(h, xf.shape[-1], w1.shape[-1])
    return conv_block_bwd_flat(
        xf, outf, g.astype(xf.dtype), h1f, h2f,
        h, w, w1, b1, w2, b2, w3, row_tile=rt,
    )


conv3_relu_flat.defvjp(_conv3f_fwd, _conv3f_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def conv3_relu_flat_dual(h, w, xa, xb, w1, b1, w2, b2, w3, b3):
    """Flat ConvBlock whose input is the channel concat [xa | xb], assembled
    per band inside the kernel (VMEM) — used by the decoder blocks so the
    upsample ++ skip concat (reference unet.py:36-44) never materializes in
    HBM, and the backward emits (dxa, dxb) directly with no XLA-side split."""
    from ..kernels.conv_block import conv_block_fused_flat_dual

    rt = _fwd_row_tile(h, xa.shape[-1] + xb.shape[-1], w1.shape[-1])
    return conv_block_fused_flat_dual(
        xa, xb, h, w, w1, b1, w2, b2, w3, b3, row_tile=rt
    )


def _conv3fd_fwd(h, w, xa, xb, w1, b1, w2, b2, w3, b3):
    from ..kernels.conv_block import conv_block_fused_flat_dual

    rt = _fwd_row_tile(h, xa.shape[-1] + xb.shape[-1], w1.shape[-1])
    outf, h1f, h2f = conv_block_fused_flat_dual(
        xa, xb, h, w, w1, b1, w2, b2, w3, b3,
        row_tile=rt, save_intermediates=True,
    )
    return outf, (xa, xb, outf, h1f, h2f, w1, b1, w2, b2, w3)


def _conv3fd_bwd(h, w, res, g):
    from ..kernels.conv_block_bwd import conv_block_bwd_flat_dual

    xa, xb, outf, h1f, h2f, w1, b1, w2, b2, w3 = res
    rt = _bwd_row_tile(h, xa.shape[-1] + xb.shape[-1], w1.shape[-1])
    return conv_block_bwd_flat_dual(
        xa, xb, outf, g.astype(xa.dtype), h1f, h2f,
        h, w, w1, b1, w2, b2, w3, row_tile=rt,
    )


conv3_relu_flat_dual.defvjp(_conv3fd_fwd, _conv3fd_bwd)


def dual_flat_enabled(ca: int, cb: int) -> bool:
    """The dual-input kernels want both lane groups 128-aligned so the
    in-kernel lane concat and the split dx writes are register moves (the
    decoder geometries U1/U2 qualify: 512+256, 256+128)."""
    return (
        ca % 128 == 0
        and cb % 128 == 0
        and os.environ.get("PDA_PALLAS_DUAL", "1") != "0"
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def conv3_relu_flat_packed_dec(h, w, ue, uo, skp, w1, b1, w2, b2, w3, b3):
    """Packed flat decoder ConvBlock whose input concat [upsample | skip]
    (reference unet.py:36-44) is assembled per band inside the kernel from
    the upsample's even/odd streams + the packed skip — no packed-upsample
    concat, no interleave, and no cotangent split ever materialize in HBM."""
    from ..kernels.conv_block_packed import conv_block_packed_flat_dec

    cin = ue.shape[-1] + skp.shape[-1] // 2
    rt = _packed_fwd_row_tile(h, cin, w1.shape[-1])
    return conv_block_packed_flat_dec(
        ue, uo, skp, h, w, w1, b1, w2, b2, w3, b3, row_tile=rt
    )


def _conv3fpd_fwd(h, w, ue, uo, skp, w1, b1, w2, b2, w3, b3):
    from ..kernels.conv_block_packed import conv_block_packed_flat_dec

    cin = ue.shape[-1] + skp.shape[-1] // 2
    rt = _packed_fwd_row_tile(h, cin, w1.shape[-1])
    outf, h1f, h2f = conv_block_packed_flat_dec(
        ue, uo, skp, h, w, w1, b1, w2, b2, w3, b3,
        row_tile=rt, save_intermediates=True,
    )
    return outf, (ue, uo, skp, outf, h1f, h2f, w1, b1, w2, b2, w3)


def _conv3fpd_bwd(h, w, res, g):
    from ..kernels.conv_block_packed_bwd import conv_block_packed_bwd_flat_dec

    ue, uo, skp, outf, h1f, h2f, w1, b1, w2, b2, w3 = res
    cin = ue.shape[-1] + skp.shape[-1] // 2
    rt = _packed_bwd_row_tile(h, cin, w1.shape[-1])
    due, duo, dskp, dw1, db1, dw2, db2, dw3, db3 = (
        conv_block_packed_bwd_flat_dec(
            ue, uo, skp, outf, g.astype(ue.dtype), h1f, h2f,
            h, w, w1, w2, w3, row_tile=rt,
        )
    )
    return due, duo, dskp, dw1, db1, dw2, db2, dw3, db3


conv3_relu_flat_packed_dec.defvjp(_conv3fpd_fwd, _conv3fpd_bwd)


def dec_packed_flat_enabled(cu: int, cs: int) -> bool:
    """Triple-input packed decoder kernel gate: the in-kernel lane offsets
    (0, cu, 2cu) must be 128-aligned (dec-U3: cu=128, cs=64 qualifies)."""
    return (
        cu % 128 == 0
        and (2 * cs) % 128 == 0
        and os.environ.get("PDA_PALLAS_DUAL", "1") != "0"
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def conv3_relu_flat_packed(h, w, input_block, xf, w1, b1, w2, b2, w3, b3):
    from ..kernels.conv_block_packed import conv_block_packed_flat

    rt = _packed_fwd_row_tile(h, xf.shape[-1] // 2, w1.shape[-1])
    return conv_block_packed_flat(
        xf, h, w, w1, b1, w2, b2, w3, b3, row_tile=rt
    )


def _skip_dx(input_block: bool) -> bool:
    """Input blocks (``ConvBlock(input_block=True)`` — the caller declares
    that xf is the NETWORK input, so its cotangent has no consumer) skip the
    backward's input-cotangent chain entirely (dx comes back as zeros and is
    DCE'd), dropping the dgrad stencil's MXU passes and the full-tensor dx
    stream. Set PDA_PALLAS_DX=1 to restore exact dx (e.g. for input-gradient
    methods). Note: in-kernel h1/h2 recompute was measured SLOWER than
    streaming here (the kernels are MXU-pass-bound, not BW-bound: +12
    recompute passes cost more than 4 full-tensor streams save), so the
    saved intermediates always stream."""
    return input_block and os.environ.get("PDA_PALLAS_DX", "0") != "1"


def _conv3fp_fwd(h, w, input_block, xf, w1, b1, w2, b2, w3, b3):
    from ..kernels.conv_block_packed import conv_block_packed_flat

    cin = xf.shape[-1] // 2
    rt = _packed_fwd_row_tile(h, cin, w1.shape[-1])
    outf, h1f, h2f = conv_block_packed_flat(
        xf, h, w, w1, b1, w2, b2, w3, b3,
        row_tile=rt, save_intermediates=True,
    )
    return outf, (xf, outf, h1f, h2f, w1, b1, w2, b2, w3)


def _packed_bwd(h, w, input_block, res, gf, gpf):
    """Shared backward body for the three packed-flat VJPs: gf is the
    full-res cotangent (None for pool-only consumers), gpf the pooled one
    (None when no pool consumer)."""
    from ..kernels.conv_block_packed_bwd import conv_block_packed_bwd_flat

    xf, outf, h1f, h2f, w1, b1, w2, b2, w3 = res
    cin = xf.shape[-1] // 2
    rt = _packed_bwd_row_tile(h, cin, w1.shape[-1])
    dxf, dw1, db1, dw2, db2, dw3, db3 = conv_block_packed_bwd_flat(
        xf, outf, None if gf is None else gf.astype(xf.dtype), h1f, h2f,
        h, w, w1, w2, w3, b1=b1, b2=b2, row_tile=rt,
        need_dx=not _skip_dx(input_block),
        gpf=None if gpf is None else gpf.astype(xf.dtype),
    )
    if dxf is None:
        dxf = jnp.zeros_like(xf)  # input block: no gradient consumer; DCE'd
    return dxf, dw1, db1, dw2, db2, dw3, db3


def _conv3fp_bwd(h, w, input_block, res, g):
    return _packed_bwd(h, w, input_block, res, g, None)


conv3_relu_flat_packed.defvjp(_conv3fp_fwd, _conv3fp_bwd)


# ---------------------------------------------------------------------------
# IMAGE-ENTRY packed block (PDA_PALLAS_IMGIN): the network-input blocks read
# the dense (B, H, W, Cin) image directly; the packed zero-ring flat is
# assembled per band in VMEM inside the kernels (forward AND the backward's
# dw1 wgrad), so the tiny-lane packed entry flat — whose lane-padded XLA
# build the round-4 trace billed at ~2-3 ms/step — never exists in HBM.
# Entry blocks by definition have no input-cotangent consumer (dx is zero
# and DCE'd). Pool variants mirror the flat entry forms below.
# ---------------------------------------------------------------------------


def image_entry_enabled() -> bool:
    return os.environ.get("PDA_PALLAS_IMGIN", "0") == "1"


def image_entry_eligible(h: int, w: int, cin: int, c: int) -> bool:
    """Image-entry kernel gate: packed geometry + full 128-lane image rows."""
    return packed_flat_eligible(h, w, cin, c) and (w * cin) % 128 == 0


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def conv3_relu_image_packed(h, w, x_img, w1, b1, w2, b2, w3, b3):
    from ..kernels.conv_block_packed import conv_block_packed_image

    rt = _packed_fwd_row_tile(h, x_img.shape[-1], w1.shape[-1])
    return conv_block_packed_image(
        x_img, h, w, w1, b1, w2, b2, w3, b3, row_tile=rt
    )


def _conv3ip_fwd(h, w, x_img, w1, b1, w2, b2, w3, b3):
    from ..kernels.conv_block_packed import conv_block_packed_image

    rt = _packed_fwd_row_tile(h, x_img.shape[-1], w1.shape[-1])
    outf, h1f, h2f = conv_block_packed_image(
        x_img, h, w, w1, b1, w2, b2, w3, b3,
        row_tile=rt, save_intermediates=True,
    )
    return outf, (x_img, outf, h1f, h2f, w1, b1, w2, b2, w3)


def _image_bwd(h, w, res, gf, gpf):
    from ..kernels.conv_block_packed_bwd import conv_block_packed_bwd_image

    x_img, outf, h1f, h2f, w1, b1, w2, b2, w3 = res
    rt = _packed_bwd_row_tile(h, x_img.shape[-1], w1.shape[-1])
    dw1, db1, dw2, db2, dw3, db3 = conv_block_packed_bwd_image(
        x_img, outf, None if gf is None else gf.astype(x_img.dtype),
        h1f, h2f, h, w, w1, w2, w3, row_tile=rt,
        gpf=None if gpf is None else gpf.astype(x_img.dtype),
    )
    # entry block: the input cotangent has no consumer (zeros, DCE'd)
    return jnp.zeros_like(x_img), dw1, db1, dw2, db2, dw3, db3


def _conv3ip_bwd(h, w, res, g):
    return _image_bwd(h, w, res, g, None)


conv3_relu_image_packed.defvjp(_conv3ip_fwd, _conv3ip_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def conv3_relu_image_packed_pool(h, w, x_img, w1, b1, w2, b2, w3, b3):
    from . import flat_ops

    return flat_ops.pool_flat_packed(
        conv3_relu_image_packed(h, w, x_img, w1, b1, w2, b2, w3, b3), h, w
    )


def _conv3ipp_fwd(h, w, x_img, w1, b1, w2, b2, w3, b3):
    from . import flat_ops

    outf, res = _conv3ip_fwd(h, w, x_img, w1, b1, w2, b2, w3, b3)
    return flat_ops.pool_flat_packed(outf, h, w), res


def _conv3ipp_bwd(h, w, res, g):
    return _image_bwd(h, w, res, None, g)


conv3_relu_image_packed_pool.defvjp(_conv3ipp_fwd, _conv3ipp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def conv3_relu_image_packed_with_pool(h, w, x_img, w1, b1, w2, b2, w3, b3):
    from . import flat_ops

    outf = conv3_relu_image_packed(h, w, x_img, w1, b1, w2, b2, w3, b3)
    return outf, flat_ops.pool_flat_packed(outf, h, w)


def _conv3ipw_fwd(h, w, x_img, w1, b1, w2, b2, w3, b3):
    from . import flat_ops

    outf, res = _conv3ip_fwd(h, w, x_img, w1, b1, w2, b2, w3, b3)
    return (outf, flat_ops.pool_flat_packed(outf, h, w)), res


def _conv3ipw_bwd(h, w, res, gs):
    g_out, g_pool = gs
    return _image_bwd(h, w, res, g_out, g_pool)


conv3_relu_image_packed_with_pool.defvjp(_conv3ipw_fwd, _conv3ipw_bwd)


# ---------------------------------------------------------------------------
# Packed block + 2x2 avg pool as one differentiable op. The forward is
# unchanged (kernel + the cheap XLA reshape-sum pool); the POOL'S TRANSPOSE
# moves into the fused backward kernel: it reads the pooled cotangent (1/4
# of the full-res stream) and broadcasts rows/lanes in VMEM, so the XLA
# broadcast op and the full-res cotangent tensor never exist in HBM.
# "pool" variant: the block output's ONLY consumer is the pool (prior/
# posterior encoder chains). "with_pool" variant: the full-res output is
# also consumed directly (the backbone's skip connection) — the backward
# takes both cotangents and adds them in VMEM (also absorbing the XLA add).
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def conv3_relu_flat_packed_pool(h, w, input_block, xf, w1, b1, w2, b2, w3, b3):
    from . import flat_ops

    return flat_ops.pool_flat_packed(
        conv3_relu_flat_packed(h, w, input_block, xf, w1, b1, w2, b2, w3, b3),
        h, w,
    )


def _conv3fpp_fwd(h, w, input_block, xf, w1, b1, w2, b2, w3, b3):
    from . import flat_ops

    outf, res = _conv3fp_fwd(h, w, input_block, xf, w1, b1, w2, b2, w3, b3)
    return flat_ops.pool_flat_packed(outf, h, w), res


def _conv3fpp_bwd(h, w, input_block, res, g):
    return _packed_bwd(h, w, input_block, res, None, g)


conv3_relu_flat_packed_pool.defvjp(_conv3fpp_fwd, _conv3fpp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def conv3_relu_flat_packed_with_pool(h, w, input_block, xf, w1, b1, w2, b2, w3, b3):
    from . import flat_ops

    outf = conv3_relu_flat_packed(h, w, input_block, xf, w1, b1, w2, b2, w3, b3)
    return outf, flat_ops.pool_flat_packed(outf, h, w)


def _conv3fpw_fwd(h, w, input_block, xf, w1, b1, w2, b2, w3, b3):
    from . import flat_ops

    outf, res = _conv3fp_fwd(h, w, input_block, xf, w1, b1, w2, b2, w3, b3)
    return (outf, flat_ops.pool_flat_packed(outf, h, w)), res


def _conv3fpw_bwd(h, w, input_block, res, gs):
    g_out, g_pool = gs
    return _packed_bwd(h, w, input_block, res, g_out, g_pool)


conv3_relu_flat_packed_with_pool.defvjp(_conv3fpw_fwd, _conv3fpw_bwd)


def flat_pyramid_plan(h: int, w: int, cin: int, filters, packed0: bool) -> bool:
    """Shared gate: run the pyramid's level 0 through the fused block+pool
    op? (Both PUNetBackbone and EncoderPyramid use this.)"""
    return (
        packed0
        and len(filters) > 1
        and packed_pool_out_eligible(h, w, cin, filters[0])
    )


def flat_pyramid_level(
    i: int, feats: int, xf, h: int, w: int, ci: int,
    *, pool_fused: bool, want_skip: bool, n_convs: int, dtype,
    input_block: bool = False,
):
    """Run contracting-pyramid level ``i`` in the flat pipeline, owning the
    fused level-0 block+pool bookkeeping shared by PUNetBackbone._call_flat
    and EncoderPyramid.__call__ (keep the two loops in lockstep).

    Returns ``(full, xf_next, h_next, w_next)``: ``full`` is the level-0
    full-res flat when ``want_skip`` and the fused path ran (the backbone's
    skip), else None; geometry halves when this level's OUTPUT was pooled
    (fused level 0) or the block pooled its INPUT (i > 0, not prepooled —
    level 1 skips its own pool when level 0 already emitted the pooled
    flat)."""
    prepooled = pool_fused and i == 1
    pool_out = (
        ("with" if want_skip else "only") if (pool_fused and i == 0) else None
    )
    out = ConvBlock(
        feats, n_convs=n_convs, pool=(i > 0 and not prepooled), dtype=dtype,
        input_block=input_block,
    )(xf, flat_geom=(h, w, ci), pool_out=pool_out)
    full = None
    if pool_out == "with":
        full, out = out
    if pool_out is not None or (i > 0 and not prepooled):
        h, w = h // 2, w // 2
    return full, out, h, w


def packed_pool_out_eligible(h: int, w: int, cin: int, c: int) -> bool:
    """Gate for the fused block+pool ops: the pooled (unpacked) flat must
    share the packed flat's row stride so the in-kernel broadcast is a pure
    reshape, and the backward row tile must split into whole pooled-row
    view blocks."""
    from ..kernels.conv_block import canvas_wp
    from ..kernels.conv_block_packed import packed_wpp

    if not packed_flat_eligible(h, w, cin, c):
        return False
    rt = min(_packed_bwd_row_tile(h, cin, c), h)
    return (
        packed_wpp(w) == canvas_wp(w // 2)
        and rt % 8 == 0
        and os.environ.get("PDA_PALLAS_POOLBWD", "1") != "0"
    )


def flat_block_eligible(h: int, w: int, cin: int, c: int) -> bool:
    """Can a ConvBlock at this geometry run the flat unpacked kernels?"""
    return (
        _fwd_row_tile(h, cin, c) > 0
        and _bwd_row_tile(h, cin, c) > 0
        and w >= 8
    )


def packed_flat_eligible(h: int, w: int, cin: int, c: int) -> bool:
    """Can a ConvBlock at this geometry run the flat PACKED kernels?"""
    return (
        c <= 64
        and w % 2 == 0
        and _packed_fwd_row_tile(h, cin, c) > 0
        and _packed_bwd_row_tile(h, cin, c) > 0
        and os.environ.get("PDA_PALLAS_PACKED", "1") != "0"
    )


@jax.custom_vjp
def conv3_relu_mixed(x, w1, b1, w2, b2, w3, b3):
    """XLA convolutions forward (fast, fused by XLA in gradient-free
    contexts), Pallas fused kernel backward."""
    h = x
    for w, b in ((w1, b1), (w2, b2), (w3, b3)):
        h = jnp.maximum(_conv_same(h, w) + b.astype(h.dtype), 0.0)
    return h


def _conv3m_fwd(x, w1, b1, w2, b2, w3, b3):
    h3 = conv3_relu_mixed(x, w1, b1, w2, b2, w3, b3)
    return h3, (x, h3, w1, b1, w2, b2, w3)


def _conv3m_bwd(res, g):
    from ..kernels.conv_block_bwd import conv_block_bwd

    x, h3, w1, b1, w2, b2, w3 = res
    rt = _bwd_row_tile(x.shape[1], x.shape[-1], w1.shape[-1])
    return conv_block_bwd(x, h3, g, w1, b1, w2, b2, w3, row_tile=rt)


conv3_relu_mixed.defvjp(_conv3m_fwd, _conv3m_bwd)


class _ConvParams(nn.Module):
    """Parameter container matching ``nn.Conv``'s param tree exactly
    (``<name>/kernel`` HWIO + ``<name>/bias``) so checkpoints and the torch
    converter are unaffected by the fused compute path."""

    features: int
    in_features: int

    def setup(self):
        self.kernel = self.param(
            "kernel", he_normal, (3, 3, self.in_features, self.features)
        )
        self.bias = self.param("bias", trunc_normal_bias(), (self.features,))


class ConvBlock(nn.Module):
    """[AvgPool] + n_convs x (Conv3x3 + ReLU).

    Reference ``DownConvBlock`` (unet_blocks.py:7-31) and the Encoder block
    (probabilistic_unet.py:44-63) share this shape; both use 3 convs per block.
    The 3-conv case runs through :func:`conv3_relu` (hand-written VJP, see
    above); other depths fall back to plain autodiff convs.
    """

    features: int
    n_convs: int = 3
    pool: bool = False
    dtype: jnp.dtype = jnp.float32
    #: The block consumes the NETWORK input (no upstream gradient consumer):
    #: the packed-flat backward may skip the input-cotangent chain (see
    #: :func:`_skip_dx`). Must be declared by the model that wires the block —
    #: never inferred from channel count.
    input_block: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, flat_geom=None, pool_out=None):
        """Image mode (default): x is (B, H, W, Cin), returns an array.
        Flat mode: pass ``flat_geom=(h, w, cin)`` with x a margin-0 flat
        (unpacked ``(B, h*wp, cin)`` or packed ``(B, h*wpp, 2*cin)``) of the
        PRE-pool geometry; the output is a flat of the same family.

        ``pool_out`` (flat-mode only — packed blocks whose consumer pools,
        gated by :func:`packed_pool_out_eligible`): ``"only"`` returns the
        2x2 avg-pooled unpacked flat instead of the block output (the
        pool's transpose runs inside the fused backward kernel); ``"with"``
        returns the TUPLE ``(outf, pooledf)`` for blocks whose full-res
        output is also consumed (the backbone skip)."""
        if flat_geom is not None:
            return self._call_flat(x, *flat_geom, pool_out=pool_out)
        assert pool_out is None, "pool_out requires flat mode (flat_geom)"
        if self.pool:
            x = avg_pool_2x2(x)
        params = []
        cin = x.shape[-1]
        for i in range(self.n_convs):
            cp = _ConvParams(
                features=self.features, in_features=cin, name=f"Conv_{i}"
            )
            params.append(cp)
            cin = self.features
        x = x.astype(self.dtype)
        if self.n_convs == 3:
            cin, c = x.shape[-1], self.features
            width = x.shape[2]

            def pick(h):
                fn = conv3_relu
                maxc = int(os.environ.get("PDA_PALLAS_MAXC", "0") or 0)
                if (
                    pallas_conv_enabled()
                    and _fwd_row_tile(h, cin, c) > 0
                    and _bwd_row_tile(h, cin, c) > 0
                    and (maxc == 0 or c <= maxc)
                ):
                    mode = os.environ.get("PDA_PALLAS_CONV_MODE", "full")
                    fn = (
                        conv3_relu_mixed if mode == "mixed"
                        else conv3_relu_pallas
                    )
                    if (
                        mode == "full"
                        and c <= 64
                        and width % 2 == 0
                        and _packed_fwd_row_tile(h, cin, c) > 0
                        and _packed_bwd_row_tile(h, cin, c) > 0
                        and os.environ.get("PDA_PALLAS_PACKED", "1") != "0"
                    ):
                        fn = conv3_relu_packed
                return fn

            weights = (
                params[0].kernel, params[0].bias,
                params[1].kernel, params[1].bias,
                params[2].kernel, params[2].bias,
            )
            if _SPACE_AXIS is not None:
                return _conv3_space_sharded(x, pick, weights, _SPACE_AXIS)
            return pick(x.shape[1])(x, *weights)
        assert _SPACE_AXIS is None, (
            "space sharding supports the 3-conv blocks only"
        )
        for cp in params:
            x = jnp.maximum(_conv_same(x, cp.kernel) + cp.bias.astype(x.dtype), 0.0)
        return x

    def _call_flat(self, x, h: int, w: int, cin: int, pool_out=None) -> jax.Array:
        from . import flat_ops

        assert self.n_convs == 3, "flat mode serves the 3-conv blocks"
        params = []
        ci = cin
        for i in range(self.n_convs):
            cp = _ConvParams(
                features=self.features, in_features=ci, name=f"Conv_{i}"
            )
            params.append(cp)
            ci = self.features
        weights = (
            params[0].kernel, params[0].bias,
            params[1].kernel, params[1].bias,
            params[2].kernel, params[2].bias,
        )
        if isinstance(x, tuple):
            # channel-split input (decoder upsample + skip): the concat
            # happens per band inside the dual/triple-input kernel
            assert not self.pool
            parts = tuple(p.astype(self.dtype) for p in x)
            if len(parts) == 3:  # packed: (upsample even, odd, packed skip)
                return conv3_relu_flat_packed_dec(h, w, *parts, *weights)
            return conv3_relu_flat_dual(h, w, *parts, *weights)
        if x.ndim == 4:
            # IMAGE entry (PDA_PALLAS_IMGIN): the network-input block reads
            # the dense image; the packed zero-ring canvas is built in-kernel
            assert not self.pool and x.shape[-1] == cin
            x = x.astype(self.dtype)
            if pool_out == "only":
                return conv3_relu_image_packed_pool(h, w, x, *weights)
            if pool_out == "with":
                return conv3_relu_image_packed_with_pool(h, w, x, *weights)
            return conv3_relu_image_packed(h, w, x, *weights)
        if self.pool:
            packed_in = x.shape[-1] == 2 * cin
            pool = flat_ops.pool_flat_packed if packed_in else flat_ops.pool_flat
            x = pool(x, h, w)
            h, w = h // 2, w // 2
        x = x.astype(self.dtype)
        packed = x.shape[-1] == 2 * cin
        if pool_out is not None:
            assert packed and not self.pool, (packed, self.pool)
            if pool_out == "only":
                return conv3_relu_flat_packed_pool(
                    h, w, self.input_block, x, *weights
                )
            assert pool_out == "with", pool_out
            return conv3_relu_flat_packed_with_pool(
                h, w, self.input_block, x, *weights
            )
        if packed:
            return conv3_relu_flat_packed(h, w, self.input_block, x, *weights)
        return conv3_relu_flat(h, w, x, *weights)


class UpBlock(nn.Module):
    """Bilinear x2 upsample + skip concat + ConvBlock.

    Reference ``UpConvBlock`` (unet_blocks.py:34-59, bilinear=True path —
    the only path the reference ever uses).
    """

    features: int
    n_convs: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, bridge: jax.Array, flat_geom=None
    ) -> jax.Array:
        """Image mode (default). Flat mode: ``flat_geom=(h, w, cin, cb,
        packed)`` where (h, w) is x's LOW-RES geometry, cin/cb the channel
        counts of x and the bridge, and ``packed`` selects the lane-packed
        layout for the upsample/concat/block (requires a packed bridge)."""
        if flat_geom is not None:
            from . import flat_ops

            h, w, cin, cb, packed = flat_geom
            # tuple inputs feed the dual/triple-input kernels: the concat
            # (and, packed, the even/odd interleave) happens per band in VMEM
            if packed and dec_packed_flat_enabled(cin, cb):
                block_in = (
                    *flat_ops.upsample_flat_packed_parts(x, h, w), bridge
                )
            elif packed:
                up = flat_ops.upsample_flat_to_packed(x, h, w)
                block_in = flat_ops.concat_packed_pair(up, bridge, cin, cb)
            elif dual_flat_enabled(cin, cb):
                block_in = (flat_ops.upsample_flat(x, h, w), bridge)
            else:
                block_in = flat_ops.concat_flat(
                    flat_ops.upsample_flat(x, h, w), bridge
                )
            return ConvBlock(self.features, n_convs=self.n_convs, dtype=self.dtype)(
                block_in, flat_geom=(2 * h, 2 * w, cin + cb)
            )
        if _SPACE_AXIS is not None:
            up = upsample_2x_align_corners_sharded(x, _SPACE_AXIS)
        else:
            up = upsample_2x_align_corners(x)
        assert up.shape[1] == bridge.shape[1] and up.shape[2] == bridge.shape[2], (
            f"skip-connection shape mismatch: {up.shape} vs {bridge.shape}"
        )
        x = jnp.concatenate([up, bridge], axis=-1)
        return ConvBlock(self.features, n_convs=self.n_convs, dtype=self.dtype)(x)


class EncoderPyramid(nn.Module):
    """Contracting conv pyramid: block_i = [pool if i>0] + n_convs convs.

    Reference ``Encoder`` (probabilistic_unet.py:18-69). Used by the prior /
    posterior Gaussian nets.
    """

    num_filters: Sequence[int]
    n_convs_per_block: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, flat_plan=None) -> jax.Array:
        """Image mode (default): x is an image, returns the last-level map.
        Flat mode (``flat_plan`` from flat_ops.flat_pipeline_plan): converts
        to the flat layout at entry, runs every block flat, and returns
        ``(flat, (h_last, w_last), last_packed)``."""
        if flat_plan is not None:
            from . import flat_ops

            b, h, w, cin = x.shape
            x = x.astype(self.dtype)
            packed0 = flat_plan["l0_packed"]
            if (packed0 and image_entry_enabled()
                    and image_entry_eligible(h, w, cin, self.num_filters[0])):
                xf = x  # level 0 reads the dense image (in-kernel canvas)
            else:
                xf = (
                    flat_ops.to_flat_packed(x) if packed0
                    else flat_ops.to_flat(x)
                )
            ci = cin
            # Level 0's output here feeds ONLY level 1's pool: emit the
            # pooled flat from the fused block+pool op when eligible (the
            # pool transpose then runs inside the backward kernel).
            pool_fused = flat_pyramid_plan(h, w, cin, self.num_filters, packed0)
            for i, feats in enumerate(self.num_filters):
                # level 0 consumes the pyramid's x, which is the NETWORK
                # input here (image, or image+mask for the posterior) — its
                # cotangent has no consumer, so the packed backward may
                # skip the dx chain
                _, xf, h, w = flat_pyramid_level(
                    i, feats, xf, h, w, ci,
                    pool_fused=pool_fused, want_skip=False,
                    n_convs=self.n_convs_per_block, dtype=self.dtype,
                    input_block=(i == 0),
                )
                ci = feats
            last_packed = packed0 and len(self.num_filters) == 1
            return xf, (h, w), last_packed
        for i, feats in enumerate(self.num_filters):
            x = ConvBlock(
                feats, n_convs=self.n_convs_per_block, pool=(i > 0), dtype=self.dtype
            )(x)
        return x
