"""Pallas TPU kernel: fused Monte-Carlo Fcomb decode + consensus reduction.

The self-training hot op (BASELINE north star): given the shared Fcomb
feature term (B, H, W, C) and S latent projections, produce the pseudo-label
(mean sigmoid over S decoded samples) and the consensus response (mean
confident-band agreement) WITHOUT materializing the (S, B, H, W) logit stack
in HBM.

Per grid cell the kernel holds one row-tile of the feature term in VMEM and
loops the S samples on-chip:

    for s in range(S):
        h = relu(feat_tile + z_term[s])          # VPU
        for Wm, bm in mid_layers: h = relu(h @ Wm + bm)   # MXU
        logit = h @ w_last + b_last              # MXU
        acc_mean += sigmoid(logit)
        acc_agree += (logit >= logit_hi) | (logit <= logit_lo)

so the (S x B x H x W x C) intermediate h never touches HBM: the XLA/vmap
path writes + reads ~S*H*W*C floats per mid layer (~1 GB per step at 512^2,
S=16, C=64) where this kernel streams the feature term exactly once.

Used on the gradient-free teacher path (pseudo-label generation); the
single-sample student decode stays in XLA.

Reference semantics being fused: prob_utils/my_trainer/
mean_teacher_trainer.py:72-88 (MC loop + thresholds 0.9/0.1 + mean).
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.consensus import LOWER_THRESHOLD, UPPER_THRESHOLD


def _logit(p: float) -> float:
    return math.log(p / (1.0 - p))


def _kernel(feat_ref, z_ref, mids_ref, mid_b_ref, wl_ref, bl_ref,
            mean_ref, cons_ref, *, n_samples: int, n_mid: int,
            logit_hi: float, logit_lo: float, batch_samples: bool = False):
    feat = feat_ref[:]  # (1, TR, C) block, compute dtype (f32 or bf16)
    feat = feat[0]
    tr = feat.shape[0]
    n_out = wl_ref.shape[1]  # 1, or 2 in the lane-packed layout
    dtype = feat.dtype
    b_idx = pl.program_id(0)

    acc_mean = jnp.zeros((tr, n_out), jnp.float32)
    acc_agree = jnp.zeros((tr, n_out), jnp.float32)

    if batch_samples:
        # ALL samples in one (S*TR, C) operand: the mid layers become one
        # MXU-sized contraction per layer instead of S serial (TR, C) @
        # (C, C) chains that leave the MXU idle between dependent steps.
        h = jnp.concatenate(
            [
                jnp.maximum(
                    feat + z_ref[s, b_idx, :][None, :].astype(dtype), 0.0
                )
                for s in range(n_samples)
            ],
            axis=0,
        )
        for m in range(n_mid):
            h = jnp.maximum(
                jnp.dot(h, mids_ref[m], preferred_element_type=jnp.float32)
                + mid_b_ref[m, :][None, :],
                0.0,
            ).astype(dtype)
        logit = (
            jnp.dot(h, wl_ref[:], preferred_element_type=jnp.float32)
            + bl_ref[0, 0]
        )
        for s in range(n_samples):
            sl = logit[s * tr : (s + 1) * tr, :]
            acc_mean = acc_mean + jax.nn.sigmoid(sl)
            acc_agree = acc_agree + jnp.where(
                jnp.logical_or(sl >= logit_hi, sl <= logit_lo), 1.0, 0.0
            )
        inv = 1.0 / n_samples
        mean_ref[:] = (acc_mean * inv)[None]
        cons_ref[:] = (acc_agree * inv)[None]
        return

    for s in range(n_samples):
        # z rows stay f32 (tiny; bf16 single-row loads break Mosaic tiling)
        z_row = z_ref[s, b_idx, :][None, :].astype(dtype)
        h = jnp.maximum(feat + z_row, 0.0)
        for m in range(n_mid):
            h = jnp.maximum(
                jnp.dot(h, mids_ref[m], preferred_element_type=jnp.float32)
                + mid_b_ref[m, :][None, :],
                0.0,
            ).astype(dtype)
        logit = (
            jnp.dot(h, wl_ref[:], preferred_element_type=jnp.float32)
            + bl_ref[0, 0]
        )
        acc_mean = acc_mean + jax.nn.sigmoid(logit)
        acc_agree = acc_agree + jnp.where(
            jnp.logical_or(logit >= logit_hi, logit <= logit_lo), 1.0, 0.0
        )

    inv = 1.0 / n_samples
    mean_ref[:] = (acc_mean * inv)[None]
    cons_ref[:] = (acc_agree * inv)[None]


def _block_diag2(w: jax.Array) -> jax.Array:
    """Lane-packing for the 1x1 tail convs: two spatial positions share a
    128-lane row; the block-diagonal keeps them independent under one MXU
    contraction. The off-diagonal zeros occupy MAC slots the 64-wide matmul
    would have wasted on lane padding anyway, so rows halve at no MAC cost.
    (Canonical construction: pda.models.flat_ops.block_diag2.)"""
    from ..models.flat_ops import block_diag2

    return block_diag2(w)


@functools.partial(
    jax.jit,
    static_argnames=("n_samples", "masking", "row_tile", "upper", "lower",
                     "pack", "batch_samples"),
)
def mc_consensus_decode(
    feat_term: jax.Array,  # (B, H, W, C) — features @ W_feat (z-independent)
    z_terms: jax.Array,  # (S, B, C)    — z @ W_z + b_z  per sample
    mid_kernels: jax.Array,  # (n_mid, C, C)
    mid_biases: jax.Array,  # (n_mid, C)
    last_kernel: jax.Array,  # (C, 1)
    last_bias: jax.Array,  # (1,)
    *,
    n_samples: int,
    masking: bool = False,
    row_tile: int = 512,
    upper: float = UPPER_THRESHOLD,
    lower: float = LOWER_THRESHOLD,
    pack: bool = False,
    batch_samples: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """(pseudo, consensus) of shape (B, H, W, 1), float32.

    ``pack=True`` lane-packs adjacent spatial positions into 128-lane rows
    (for C = 64: full vector registers, ~1.5x HBM streaming, half the MXU
    row count via block-diagonal tail weights). Requires H*W even.
    """
    b, h, w, c = feat_term.shape
    dtype = feat_term.dtype  # keep the model's compute dtype (f32 or bf16)
    n_mid = mid_kernels.shape[0]
    rows = h * w
    if pack:
        assert rows % 2 == 0, (h, w)
        rows //= 2
        c *= 2
        z_terms = jnp.concatenate([z_terms, z_terms], axis=-1)
        mid_kernels = jax.vmap(_block_diag2)(mid_kernels)
        mid_biases = jnp.concatenate([mid_biases, mid_biases], axis=-1)
        last_kernel = _block_diag2(last_kernel)
    assert rows % row_tile == 0, (rows, row_tile)
    flat = feat_term.reshape(b, rows, c)

    grid = (b, rows // row_tile)
    kernel = functools.partial(
        _kernel,
        n_samples=n_samples,
        n_mid=n_mid,
        logit_hi=_logit(upper),
        logit_lo=_logit(lower),
        batch_samples=batch_samples,
    )
    mean, cons = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, row_tile, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # z_terms: full (S, B, C)
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, row_tile, 2 if pack else 1),
                         lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, row_tile, 2 if pack else 1),
                         lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, rows, 2 if pack else 1), jnp.float32),
            jax.ShapeDtypeStruct((b, rows, 2 if pack else 1), jnp.float32),
        ],
    )(
        flat,
        z_terms.astype(jnp.float32),
        mid_kernels.astype(dtype),
        mid_biases.astype(jnp.float32),
        last_kernel.astype(dtype),
        last_bias.reshape(1, 1).astype(jnp.float32),
    )
    pseudo = mean.reshape(b, h, w, 1)
    consensus = cons.reshape(b, h, w, 1)
    if masking:
        consensus = (consensus == 1.0).astype(jnp.float32)
    return pseudo, consensus


def fcomb_tail_weights(fcomb_params):
    """Extract (mid_kernels, mid_biases, last_kernel, last_bias) stacks from a
    Fcomb parameter subtree (pda.models.punet.Fcomb setup names)."""
    mids = sorted(k for k in fcomb_params if k.startswith("mid_"))
    if mids:
        mid_kernels = jnp.stack([fcomb_params[m]["kernel"] for m in mids])
        mid_biases = jnp.stack([fcomb_params[m]["bias"] for m in mids])
    else:
        c = fcomb_params["feat_proj"]["kernel"].shape[1]
        mid_kernels = jnp.zeros((0, c, c))
        mid_biases = jnp.zeros((0, c))
    return (
        mid_kernels,
        mid_biases,
        fcomb_params["last_layer"]["kernel"],
        fcomb_params["last_layer"]["bias"],
    )


def mc_pseudo_fused(model, params, x, key, n_samples: int, masking: bool):
    """Drop-in fused replacement for the teacher MC pseudo-label path
    (pda.train.steps._mc_pseudo): backbone encode in XLA, per-sample Fcomb
    tail + consensus in the Pallas kernel.

    Only valid for single-class PUNets (num_classes == 1)."""
    params = jax.lax.stop_gradient(params)
    enc = model.apply({"params": params}, x, method="encode")
    feat_term = model.apply(
        {"params": params}, enc.features, method="decode_feature_term"
    )
    zs = enc.prior.sample_n(key, n_samples)  # (S, B, L)
    zp = params["fcomb"]["z_proj"]
    z_terms = zs @ zp["kernel"].astype(zs.dtype) + zp["bias"].astype(zs.dtype)
    mid_k, mid_b, last_k, last_b = fcomb_tail_weights(params["fcomb"])
    rows = feat_term.shape[1] * feat_term.shape[2]
    pack = feat_term.shape[-1] <= 64 and rows % 2 == 0
    if pack:
        rows //= 2
    row_tile = 512 if rows % 512 == 0 else int(
        np.gcd(rows, 512 * 512)
    )
    pseudo, consensus = mc_consensus_decode(
        feat_term, z_terms, mid_k, mid_b, last_k, last_b,
        n_samples=n_samples, masking=masking, row_tile=row_tile, pack=pack,
    )
    return pseudo, consensus
