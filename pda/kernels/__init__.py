"""Pallas TPU kernels for the hot ops."""

from .conv_block import conv_block_fused, conv_block_weights
from .mc_consensus import mc_consensus_decode, mc_pseudo_fused

__all__ = [
    "mc_consensus_decode",
    "mc_pseudo_fused",
    "conv_block_fused",
    "conv_block_weights",
]
