"""Pallas TPU kernel: fused 3x(conv3x3 + bias + ReLU) block forward.

The PUNet's universal building block (pda.models.blocks.ConvBlock; reference
unet_blocks.py DownConvBlock / Encoder blocks) executed as ONE kernel: a row
band of the input is DMA'd into VMEM once and all three convolutions run over
it, so the two intermediate activation maps never touch HBM. XLA lowers the
same block as three conv calls with padded-layout copies between them (~6 HBM
round trips of the activation map); this kernel does one read + one write.

Convolution is expressed as 9 shifted matmuls per layer — for each kernel tap
(dy, dx), a ((rows)*(cols), Cin) x (Cin, Cout) contraction on the MXU — the
standard TPU-friendly formulation for small spatial kernels. Row bands
overlap by the 6-row halo the three chained VALID convs consume; since a
standard BlockSpec cannot express overlapping windows and manual HBM DMA
requires 128-lane-aligned slices (violated at C=64), the overlapping bands
are materialized once on the host side of the call (one extra HBM pass over
the input, ~(1 + 6/row_tile)x its size) and streamed through the normal grid
pipeline.

Gradient-free use only (teacher encode / inference); training keeps XLA's
convs with their autodiff. SAME (zero) padding semantics match
``nn.Conv(padding="SAME")``.

STATUS: semantics verified against flax (interpreter mode, 1e-6 agreement);
the container's remote-compile toolchain currently crashes (opaque helper
exit) lowering this kernel on-chip at any geometry, while the MC-consensus
kernel (pda.kernels.mc_consensus) compiles and runs fine. On-chip enablement
is a round-2 item; until then XLA convs remain the production path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _conv3x3_valid(x, w, rows: int, cols: int):
    """VALID 3x3 conv on x (rows+2, cols+2, Cin) -> (rows, cols, Cout),
    as 9 shifted MXU matmuls accumulated in f32."""
    cin = x.shape[-1]
    cout = w.shape[-1]
    acc = jnp.zeros((rows * cols, cout), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            patch = x[dy : dy + rows, dx : dx + cols, :].reshape(rows * cols, cin)
            acc = acc + jnp.dot(
                patch, w[dy, dx], preferred_element_type=jnp.float32
            )
    return acc.reshape(rows, cols, cout)


def _edge_mask(rows: int, cols: int, margin: int, row0, h_total: int, dtype):
    """Zero-mask for canvas positions outside the real image.

    The canvas spans image rows [row0, row0 + rows) and image columns
    [-margin, cols - margin); SAME-padding semantics require intermediate
    activations OUTSIDE the image to be exactly zero before the next conv
    (zero-padding), not the relu(bias + ...) values a naive valid-conv chain
    produces there."""
    # build 3-D directly: Mosaic cannot insert a minor dim on sub-32-bit types
    r = jax.lax.broadcasted_iota(jnp.int32, (rows, cols, 1), 0) + row0
    c = jax.lax.broadcasted_iota(jnp.int32, (rows, cols, 1), 1) - margin
    valid = (r >= 0) & (r < h_total) & (c >= 0) & (c < cols - 2 * margin)
    return valid.astype(dtype)


def _kernel(xband_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
            out_ref, *, th: int, w_out: int, h_total: int):
    j = pl.program_id(1)  # row-band index
    x = xband_ref[0, 0]
    dtype = x.dtype
    row0 = j * th  # image row of the band's first canvas row is row0 - 3

    h1 = _conv3x3_valid(x, w1_ref[:], th + 4, w_out + 4)
    h1 = jnp.maximum(h1 + b1_ref[:][None, None, :], 0.0).astype(dtype)
    h1 = h1 * _edge_mask(th + 4, w_out + 4, 2, row0 - 2, h_total, dtype)

    h2 = _conv3x3_valid(h1, w2_ref[:], th + 2, w_out + 2)
    h2 = jnp.maximum(h2 + b2_ref[:][None, None, :], 0.0).astype(dtype)
    h2 = h2 * _edge_mask(th + 2, w_out + 2, 1, row0 - 1, h_total, dtype)

    h3 = _conv3x3_valid(h2, w3_ref[:], th, w_out)
    h3 = jnp.maximum(h3 + b3_ref[:][None, None, :], 0.0).astype(dtype)

    out_ref[0] = h3


@functools.partial(jax.jit, static_argnames=("row_tile", "interpret"))
def conv_block_fused(
    x: jax.Array,  # (B, H, W, Cin)
    w1: jax.Array, b1: jax.Array,  # (3, 3, Cin, C), (C,)
    w2: jax.Array, b2: jax.Array,  # (3, 3, C, C), (C,)
    w3: jax.Array, b3: jax.Array,
    *,
    row_tile: int = 32,
    interpret: bool = False,
) -> jax.Array:
    """Fused ConvBlock forward: relu(conv(relu(conv(relu(conv(x)))))).

    Equivalent to three SAME-padded ``nn.Conv`` + relu layers. H must divide
    ``row_tile``.
    """
    b, h, w, cin = x.shape
    c = w1.shape[-1]
    assert h % row_tile == 0, (h, row_tile)
    dtype = x.dtype

    # one zero-pad carrying the full 3-conv halo, then materialize the
    # overlapping row bands once: (B, nbands, row_tile+6, w+6, cin)
    xp = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
    nb = h // row_tile
    bands = jnp.stack(
        [xp[:, j * row_tile : j * row_tile + row_tile + 6] for j in range(nb)],
        axis=1,
    )

    grid = (b, nb)
    kernel = functools.partial(_kernel, th=row_tile, w_out=w, h_total=h)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, 1, row_tile + 6, w + 6, cin),
                lambda i, j: (i, j, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, row_tile, w, c), lambda i, j: (i, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), dtype),
        interpret=interpret,
    )(
        bands,
        w1.astype(dtype), b1.astype(jnp.float32),
        w2.astype(dtype), b2.astype(jnp.float32),
        w3.astype(dtype), b3.astype(jnp.float32),
    )
    return out


def conv_block_weights(params):
    """(w1, b1, w2, b2, w3, b3) from a pda ConvBlock param subtree."""
    return (
        params["Conv_0"]["kernel"], params["Conv_0"]["bias"],
        params["Conv_1"]["kernel"], params["Conv_1"]["bias"],
        params["Conv_2"]["kernel"], params["Conv_2"]["bias"],
    )
