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


class ConvBlock(nn.Module):
    """[AvgPool] + n_convs x (Conv3x3 + ReLU).

    Reference ``DownConvBlock`` (unet_blocks.py:7-31) and the Encoder block
    (probabilistic_unet.py:44-63) share this shape; both use 3 convs per block.
    """

    features: int
    n_convs: int = 3
    pool: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.pool:
            x = avg_pool_2x2(x)
        for _ in range(self.n_convs):
            x = nn.Conv(
                self.features,
                (3, 3),
                padding="SAME",
                kernel_init=he_normal,
                bias_init=trunc_normal_bias(),
                dtype=self.dtype,
            )(x)
            x = nn.relu(x)
        return x


class UpBlock(nn.Module):
    """Bilinear x2 upsample + skip concat + ConvBlock.

    Reference ``UpConvBlock`` (unet_blocks.py:34-59, bilinear=True path —
    the only path the reference ever uses).
    """

    features: int
    n_convs: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, bridge: jax.Array) -> jax.Array:
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
    def __call__(self, x: jax.Array) -> jax.Array:
        for i, feats in enumerate(self.num_filters):
            x = ConvBlock(
                feats, n_convs=self.n_convs_per_block, pool=(i > 0), dtype=self.dtype
            )(x)
        return x
