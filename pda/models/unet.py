"""UNet backbones — flax.linen, NHWC.

Two models:
  * :class:`PUNetBackbone` — the 4-level UNet used inside the PUNet
    (reference prob_utils/my_models/unet.py:6-69): AvgPool down, bilinear
    align-corners up, 3 convs per block, ``apply_last_layer=False`` mode so
    Fcomb provides the segmentation head.
  * :class:`UNet2d` — standalone supervised segmentation UNet, the capability
    equivalent of torch_em ``model.UNet2d`` used by the plain-UNet experiments
    (reference LIVECell/livecell_unet.py:39-45): depth-d double-conv blocks,
    max-pool down, transposed-conv up, optional final sigmoid.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import ConvBlock, UpBlock, he_normal, trunc_normal_bias


class PUNetBackbone(nn.Module):
    """The UNet inside the probabilistic UNet (reference unet.py:6-69).

    Returns the last-decoder feature map (``apply_last_layer=False``) of
    ``num_filters[0]`` channels by default; with ``num_classes`` set it adds
    the 1x1 segmentation head (``apply_last_layer=True``).
    """

    num_filters: Sequence[int] = (64, 128, 256, 512)
    n_convs_per_block: int = 3
    num_classes: Optional[int] = None  # None => apply_last_layer=False
    dtype: jnp.dtype = jnp.float32

    def _flat_plan(self, x: jax.Array):
        """Flat-pipeline eligibility at this input geometry (None = image
        path). Only taken on TPU with the Pallas kernels enabled."""
        from .flat_ops import module_flat_plan

        return module_flat_plan(
            x, self.num_filters, self.n_convs_per_block, with_decoder=True
        )

    @nn.compact
    def __call__(self, x: jax.Array, keep_flat: bool = False):
        """``keep_flat=True`` (flat pipeline only, requires
        ``num_classes=None``): return ``(flat_features, packed)`` in the
        decoder's margin-0 flat layout instead of converting to image —
        the Fcomb tail is 1x1 convs, i.e. layout-agnostic matmuls, so the
        flat->image boundary can move past it to the 1-channel logits
        (pda.models.punet.fcomb_decode_flat). Falls back to the image
        return (keep_flat ignored) when the flat plan is ineligible."""
        plan = self._flat_plan(x)
        if plan is not None:
            return self._call_flat(
                x, plan, keep_flat=keep_flat and self.num_classes is None
            )
        depth = len(self.num_filters)
        skips = []
        for i, feats in enumerate(self.num_filters):
            x = ConvBlock(
                feats, n_convs=self.n_convs_per_block, pool=(i > 0), dtype=self.dtype
            )(x)
            if i != depth - 1:
                skips.append(x)

        for i in range(depth - 2, -1, -1):
            x = UpBlock(
                self.num_filters[i], n_convs=self.n_convs_per_block, dtype=self.dtype
            )(x, skips[i])

        if self.num_classes is not None:
            x = nn.Conv(
                self.num_classes,
                (1, 1),
                kernel_init=he_normal,
                bias_init=trunc_normal_bias(),
                dtype=self.dtype,
            )(x)
        return x

    def _call_flat(self, x: jax.Array, plan, keep_flat: bool = False):
        """The flat activation pipeline: image layout only at the input and
        the returned feature map — every block edge (pool, upsample, skip
        concat) stays in the margin-0 flat layouts (see flat_ops).
        With ``keep_flat`` the output stays flat too: ``(flat, packed)``."""
        from . import flat_ops

        b, h0, w0, cin = x.shape
        depth = len(self.num_filters)
        x = x.astype(self.dtype)
        packed0 = plan["l0_packed"]
        from .blocks import image_entry_eligible, image_entry_enabled

        if (packed0 and image_entry_enabled()
                and image_entry_eligible(h0, w0, cin, self.num_filters[0])):
            xf = x  # level 0 reads the dense image; canvas built in-kernel
        else:
            xf = flat_ops.to_flat_packed(x) if packed0 else flat_ops.to_flat(x)

        skips = []  # (flat, (h, w), channels)
        h, w, ci = h0, w0, cin
        # Level 0 output feeds the skip AND level 1's pool: the fused
        # block+pool op returns both, and the pool's transpose (plus the
        # skip/pool cotangent add) runs inside the backward kernel.
        from .blocks import flat_pyramid_level, flat_pyramid_plan

        pool_fused = flat_pyramid_plan(h0, w0, cin, self.num_filters, packed0)
        for i, feats in enumerate(self.num_filters):
            h_in, w_in = h, w
            # level 0 consumes the backbone's x = the NETWORK input (raw
            # image): no gradient consumer upstream, so the packed backward
            # may skip the dx chain
            full, xf, h, w = flat_pyramid_level(
                i, feats, xf, h, w, ci,
                pool_fused=pool_fused, want_skip=True,
                n_convs=self.n_convs_per_block, dtype=self.dtype,
                input_block=(i == 0),
            )
            if i != depth - 1:
                # the skip is the level's full-res output: `full` (pre-pool
                # geometry) on the fused level 0, else the block output
                if full is not None:
                    skips.append((full, (h_in, w_in), feats))
                else:
                    skips.append((xf, (h, w), feats))
            ci = feats

        for i in range(depth - 2, -1, -1):
            bridge, (bh, bw), cb = skips[i]
            packed = i == 0 and plan["dec_packed"]
            xf = UpBlock(
                self.num_filters[i], n_convs=self.n_convs_per_block,
                dtype=self.dtype,
            )(xf, bridge, flat_geom=(h, w, ci, cb, packed))
            h, w = bh, bw
            ci = self.num_filters[i]

        if keep_flat:
            return xf, plan["dec_packed"]
        out = (
            flat_ops.from_flat_packed(xf, h, w)
            if plan["dec_packed"]
            else flat_ops.from_flat(xf, h, w)
        )
        if self.num_classes is not None:
            out = nn.Conv(
                self.num_classes,
                (1, 1),
                kernel_init=he_normal,
                bias_init=trunc_normal_bias(),
                dtype=self.dtype,
            )(out)
        return out


class _DoubleConv(nn.Module):
    """torch_em ``ConvBlock2d``: (InstanceNorm -> Conv3x3 -> ReLU) x 2.

    The norm runs BEFORE each conv (torch_em model/unet.py ConvBlock) and is
    PyTorch's parameterless ``nn.InstanceNorm2d`` (affine=False, eps=1e-5) —
    per-sample per-channel standardization over H,W with no learned
    scale/bias, so the flax param tree holds only the two conv kernels and
    the converted torch state dicts line up one-to-one."""

    features: int
    norm: Optional[str] = "InstanceNorm"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        for _ in range(2):
            if self.norm == "InstanceNorm":
                x = nn.GroupNorm(
                    num_groups=None, group_size=1, use_bias=False,
                    use_scale=False, epsilon=1e-5, dtype=self.dtype,
                )(x)
            x = nn.Conv(self.features, (3, 3), padding="SAME", dtype=self.dtype)(x)
            x = nn.relu(x)
        return x


class UNet2d(nn.Module):
    """Standalone 2D segmentation UNet — torch_em ``UNet2d`` with the exact
    reference architecture so torch checkpoints port weight-for-weight
    (``pda.models.convert.convert_unet_state_dict``).

    Reference call sites: LIVECell/livecell_unet.py:39-45,
    MitoEM/mitoem_unet.py:18-24 (SURVEY.md section 2.9). Structure (torch_em
    model/unet.py): depth-d encoder of (InstanceNorm->Conv3x3->ReLU)x2
    blocks, 2x2 max-pool down, base block at ``initial_features*gain**depth``,
    decoder of bilinear x2 upsample (half-pixel centers, PyTorch
    ``align_corners=False``) + 1x1 conv samplers with skip concatenation
    [up | skip], 1x1 out conv, optional sigmoid.
    """

    in_channels: int = 1
    out_channels: int = 1
    depth: int = 4
    initial_features: int = 64
    gain: int = 2
    final_activation: Optional[str] = "sigmoid"
    norm: Optional[str] = "InstanceNorm"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from .blocks import space_axis

        assert space_axis() is None, (
            "UNet2d has no halo-exchange path (its half-pixel bilinear "
            "upsample and 2-conv blocks are not row-shard aware); run "
            "spatial meshes through PDA_DP_IMPL=gspmd for this model"
        )
        feats = [self.initial_features * self.gain**i for i in range(self.depth + 1)]

        skips = []
        for i in range(self.depth):
            x = _DoubleConv(feats[i], norm=self.norm, dtype=self.dtype)(x)
            skips.append(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))

        x = _DoubleConv(feats[self.depth], norm=self.norm, dtype=self.dtype)(x)

        for i in range(self.depth - 1, -1, -1):
            # torch_em Upsampler2d: F.interpolate(scale_factor=2,
            # mode="bilinear") [align_corners=False == half-pixel centers,
            # jax.image.resize "linear"] followed by a 1x1 conv
            n, h, w, c = x.shape
            x = jax.image.resize(
                x.astype(jnp.float32), (n, 2 * h, 2 * w, c), method="linear"
            ).astype(self.dtype)
            x = nn.Conv(feats[i], (1, 1), dtype=self.dtype)(x)
            x = jnp.concatenate([x, skips[i]], axis=-1)
            x = _DoubleConv(feats[i], norm=self.norm, dtype=self.dtype)(x)

        x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype)(x)
        x = x.astype(jnp.float32)  # head stays f32 for stable loss sums
        if (self.final_activation or "").lower() == "sigmoid":
            x = nn.sigmoid(x)  # torch_em accepts "Sigmoid" (getattr(nn, ...))
        return x
