"""Pallas TPU kernel: fused 3x(conv3x3 + bias + ReLU) block forward.

The PUNet's universal building block (pda.models.blocks.ConvBlock; reference
unet_blocks.py DownConvBlock / Encoder blocks, probabilistic_unet.py:44-63)
executed as ONE kernel: a row band of the input is DMA'd into VMEM once and
all three convolutions run over it, so the two intermediate activation maps
never touch HBM and the ReLUs are free VPU ops on resident registers. XLA
lowers the same block as three standalone convolutions with relayout copies
and unfused ReLU passes between them (measured: ~26% of the 512^2 MT train
step was standalone `max` ops and ~15% pure layout copies).

Formulation (chosen for Mosaic's lowering rules, all operands strictly 2D):

  * The (H, W, C) image is zero-ring-padded into a (H+6, Wp) canvas (Wp =
    W+6 rounded up to the sublane tile) and flattened row-major to
    ((H+6)*Wp, C); overlapping row bands of rt+6 rows are materialized once
    outside the kernel (one extra ~(1+6/rt)x pass over the input).
  * Row (dy) shifts are slices at dy*Wp — sublane-ALIGNED because Wp is a
    multiple of 16 — so the three dy views lane-concatenate into a
    (L, 3*Cin) matrix G. Mosaic rejects concats of mismatched-offset slices;
    aligned starts keep the offsets equal.
  * Column (dx) shifts become *one* unaligned slice of the concatenated
    value: tap (dy, dx) of position p is G[p + dx, dy*Cin:(dy+1)*Cin]. Each
    layer is 3 MXU contractions (L, 3*Cin) @ (3*Cin, Cout) — K = 3*Cin
    instead of Cin, which matters at the 64-channel levels.
  * Layer l's buffer stores values shifted l flat elements left; with that
    convention every layer's slice starts are dy*Wp + dx >= 0 and the final
    3-element shift is undone by the caller with one pad+slice.
  * Flat-index wraparound (col j+1 of the row's last column reads the next
    row's first column) always lands in the zero ring, and ring/out-of-image
    garbage (relu(bias) != 0) is re-zeroed per layer by an iota mask — the
    same invariant SAME zero padding provides between XLA convs.

Gradient-free use (teacher MC sampling / inference / pseudo-labeling): the
training path keeps XLA's autodiff convs unless the custom-VJP wrapper in
pda.kernels.conv_block_vjp is enabled.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MARGIN = 3  # zero ring width: halo of three chained 3x3 convs
TAIL = 24  # zero headroom appended to each band (dx-slice overrun budget)
#: per-layer output tail lengths: layer l's output carries TAILS[l] extra flat
#: elements so layer l+1's dy/dx slices stay in bounds (each layer consumes 2)
TAILS = (16, 8, 0)


def _round16(n: int) -> int:
    return ((n + 15) // 16) * 16


def _regroup(w: jax.Array) -> jax.Array:
    """(3, 3, Cin, Cout) HWIO -> (3_dx, 3*Cin, Cout), rows ordered (dy, cin)
    to match the dy-major lane concat of the input views."""
    return jnp.transpose(w, (1, 0, 2, 3)).reshape(3, 3 * w.shape[2], w.shape[3])


def _kernel(
    x_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref, o_ref,
    *, rt: int, wp: int, h_img: int, w_img: int, dtype,
):
    n = pl.program_id(1)  # band index within the image

    def layer(h, w_ref, b_ref, l_out: int, tail: int, shift: int, mask: bool):
        n_out = l_out + tail
        # dy views, Wp-aligned starts -> lane concat is legal
        g = jnp.concatenate(
            [h[dy * wp : dy * wp + n_out + 2, :] for dy in range(3)], axis=1
        )
        acc = jnp.zeros((n_out, w_ref.shape[2]), jnp.float32)
        for dx in range(3):
            acc = acc + jax.lax.dot_general(
                g[dx : dx + n_out, :],
                w_ref[dx],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        out = jnp.maximum(acc + b_ref[0][None, :], 0.0)
        if mask:
            # buffer index b holds canvas flat position q = b + shift; this
            # layer's canvas rows start at `shift`
            q = jax.lax.broadcasted_iota(jnp.int32, (n_out, 1), 0) + shift
            row = q // wp + shift
            col = q - (q // wp) * wp
            g_row = n * rt + row - MARGIN  # global image row
            valid = (
                (g_row >= 0) & (g_row < h_img)
                & (col >= MARGIN) & (col < w_img + MARGIN)
            )
            out = jnp.where(valid, out, 0.0)
        return out.astype(dtype)

    x = x_ref[0, 0]
    h1 = layer(x, w1_ref, b1_ref, (rt + 4) * wp, TAILS[0], 1, True)
    h2 = layer(h1, w2_ref, b2_ref, (rt + 2) * wp, TAILS[1], 2, True)
    h3 = layer(h2, w3_ref, b3_ref, rt * wp, TAILS[2], 3, False)
    o_ref[0, 0] = h3[: rt * wp, :]


@functools.partial(
    jax.jit, static_argnames=("row_tile", "interpret", "out_dtype")
)
def conv_block_fused(
    x: jax.Array,  # (B, H, W, Cin)
    w1: jax.Array, b1: jax.Array,  # (3, 3, Cin, C), (C,)
    w2: jax.Array, b2: jax.Array,  # (3, 3, C, C), (C,)
    w3: jax.Array, b3: jax.Array,
    *,
    row_tile: int = 16,
    interpret: bool = False,
    out_dtype=None,
) -> jax.Array:
    """Fused ConvBlock forward: relu(conv(relu(conv(relu(conv(x)))))).

    Matches three SAME-padded ``nn.Conv`` + relu layers. H must divide
    ``row_tile``.
    """
    b, h, w, cin = x.shape
    c = w1.shape[-1]
    rt = min(row_tile, h)
    assert h % rt == 0, (h, rt)
    nb = h // rt
    wp = _round16(w + 2 * MARGIN)
    dtype = x.dtype if out_dtype is None else out_dtype

    # zero-ring canvas, flattened row-major, one tail tile of zeros
    canvas = jnp.zeros((b, h + 2 * MARGIN, wp, cin), x.dtype)
    canvas = jax.lax.dynamic_update_slice(canvas, x, (0, MARGIN, MARGIN, 0))
    flat = canvas.reshape(b, (h + 2 * MARGIN) * wp, cin)
    flat = jnp.pad(flat, ((0, 0), (0, TAIL), (0, 0)))

    # overlapping row bands: band n = canvas rows [n*rt, n*rt + rt + 6) + tail
    lb = (rt + 6) * wp + TAIL
    starts = jnp.arange(nb, dtype=jnp.int32) * (rt * wp)

    def _band(img):
        return jax.vmap(
            lambda s: jax.lax.dynamic_slice(img, (s, 0), (lb, cin))
        )(starts)

    bands = jax.vmap(_band)(flat)  # (B, nb, lb, cin)

    kernel = functools.partial(
        _kernel, rt=rt, wp=wp, h_img=h, w_img=w, dtype=dtype
    )
    wspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(b, nb),
        in_specs=[
            pl.BlockSpec((1, 1, lb, cin), lambda i, n: (i, n, 0, 0),
                         memory_space=pltpu.VMEM),
            wspec, wspec, wspec, wspec, wspec, wspec,
        ],
        out_specs=pl.BlockSpec(
            (1, 1, rt * wp, c), lambda i, n: (i, n, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, nb, rt * wp, c), dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        bands,
        _regroup(w1.astype(x.dtype)), b1.astype(jnp.float32)[None, :],
        _regroup(w2.astype(x.dtype)), b2.astype(jnp.float32)[None, :],
        _regroup(w3.astype(x.dtype)), b3.astype(jnp.float32)[None, :],
    )

    # undo the 3-element flat shift, then crop the ring columns
    out = out.reshape(b, nb * rt * wp, c)
    out = jnp.pad(out, ((0, 0), (MARGIN, 0), (0, 0)))[:, : nb * rt * wp, :]
    out = out.reshape(b, h, wp, c)
    return out[:, :, MARGIN : MARGIN + w, :]


def conv_block_weights(params):
    """(w1, b1, w2, b2, w3, b3) from a pda ConvBlock param subtree."""
    return (
        params["Conv_0"]["kernel"], params["Conv_0"]["bias"],
        params["Conv_1"]["kernel"], params["Conv_1"]["bias"],
        params["Conv_2"]["kernel"], params["Conv_2"]["bias"],
    )
