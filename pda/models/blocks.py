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

from typing import Sequence

import jax
import jax.numpy as jnp
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
    t = jnp.arange(2 * n, dtype=jnp.float32) * ((n - 1) / (2 * n - 1))
    lo = jnp.floor(t).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, n - 1)
    frac = t - lo.astype(jnp.float32)
    return lo, hi, frac


def upsample_2x_align_corners(x: jax.Array) -> jax.Array:
    """Bilinear x2 upsampling with align_corners=True semantics, NHWC.

    Matches torch ``F.interpolate(mode="bilinear", scale_factor=2,
    align_corners=True)`` (reference unet_blocks.py:51). jax.image.resize uses
    half-pixel centers (align_corners=False), so this is a static-index
    gather-lerp instead — two gathers per axis, fully fusible by XLA.
    """
    _, h, w, _ = x.shape
    lo_h, hi_h, fr_h = _upsample_indices(h)
    fr_h = fr_h[None, :, None, None].astype(x.dtype)
    x = x[:, lo_h] * (1.0 - fr_h) + x[:, hi_h] * fr_h
    lo_w, hi_w, fr_w = _upsample_indices(w)
    fr_w = fr_w[None, None, :, None].astype(x.dtype)
    x = x[:, :, lo_w] * (1.0 - fr_w) + x[:, :, hi_w] * fr_w
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
