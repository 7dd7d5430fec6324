"""Pallas TPU kernels for the hot ops."""

from .mc_consensus import mc_consensus_decode, mc_pseudo_fused

__all__ = ["mc_consensus_decode", "mc_pseudo_fused"]
