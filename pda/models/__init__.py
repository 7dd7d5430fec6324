"""Flax models: PUNet family + standalone UNet2d (NHWC, TPU-native)."""

from .blocks import (
    ConvBlock,
    EncoderPyramid,
    UpBlock,
    avg_pool_2x2,
    upsample_2x_align_corners,
)
from .punet import (
    Fcomb,
    GaussianEncoder,
    ProbabilisticUnet,
    PUNetEncoding,
    decode,
    encode,
    mc_decode_logits,
    mc_predict_probs,
)
from .unet import PUNetBackbone, UNet2d

__all__ = [
    "ConvBlock",
    "UpBlock",
    "EncoderPyramid",
    "avg_pool_2x2",
    "upsample_2x_align_corners",
    "PUNetBackbone",
    "UNet2d",
    "GaussianEncoder",
    "Fcomb",
    "ProbabilisticUnet",
    "PUNetEncoding",
    "encode",
    "decode",
    "mc_decode_logits",
    "mc_predict_probs",
]
