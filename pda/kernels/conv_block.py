"""Pallas TPU kernel: fused 3x(conv3x3 + bias + ReLU) block forward.

The PUNet's universal building block (pda.models.blocks.ConvBlock; reference
unet_blocks.py DownConvBlock / Encoder blocks, probabilistic_unet.py:44-63)
executed as ONE kernel: a row band of the input is resident in VMEM while all
three convolutions run, so the two intermediate activation maps never touch
HBM and the ReLUs are free VPU ops. XLA lowers the same block as three
standalone convolutions with relayout copies and unfused ReLU passes between
them (measured: ~26% of the 512^2 MT train step was standalone `max` ops and
~15% pure layout copies).

Formulation (chosen for Mosaic's lowering rules, all operands strictly 2D):

  * The (H, W, C) image sits in a zero-ring canvas (margin 4, Wp = W+8
    rounded to the sublane tile) flattened row-major to ((H+8)*Wp, C).
  * Each grid step sees its overlapping band through TWO views of the SAME
    canvas: a non-overlapping core block (rt rows) and an 8-row halo block
    whose index map lands exactly on the next core's start (legal because
    rt % 8 == 0) — overlap therefore never costs extra HBM traffic, unlike
    materializing overlapping bands host-side.
  * Row (dy) shifts are slices at dy*Wp — sublane-ALIGNED because Wp is a
    multiple of 16. Each layer runs the "nocat" stencil: one MXU contraction
    (L, Cin) @ (Cin, 3*Cout) per dy, then the three dx taps fall out as
    shifted adds of the result's lane blocks (measured fastest of the
    Mosaic-legal formulations on v5e: 47 TFLOP/s at 512^2/64ch, above XLA's
    in-program conv throughput).
  * Layer l's buffer stores values shifted l flat elements left; with that
    convention every slice start is >= 0. The final shift is undone by the
    caller with one pad+slice.
  * Flat-index wraparound lands in the zero ring, and ring/out-of-image
    garbage (relu(bias) != 0) is re-zeroed per layer by an iota mask — the
    same invariant SAME zero padding provides between XLA convs.

The matching fused backward lives in pda.kernels.conv_block_bwd and shares
the canvas geometry, so the forward's input canvas is reused as a residual.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _compiler_params(vmem_mb: int = 120, allow_dimsem: bool = True):
    """Shared CompilerParams for every fused conv-block kernel: VMEM budget.

    Grid 'parallel' dimension semantics were probed (round 2-3: step-level
    wash, 23.86 vs 23.97 patches/s) and removed; the backward kernels'
    dw/db outputs are grid-constant accumulators that REQUIRE strictly
    sequential grid iteration, so dimension semantics must never be emitted
    there (``allow_dimsem`` retained for call-site documentation)."""
    return pltpu.CompilerParams(vmem_limit_bytes=vmem_mb * 1024 * 1024)


def _compiler_params_bwd(vmem_mb: int = 120):
    """CompilerParams for the backward kernels (both the unpacked and the
    packed family): dw/db accumulate in grid-constant output blocks, so
    sequential grid iteration is load-bearing."""
    return _compiler_params(vmem_mb, allow_dimsem=False)

MARGIN = 4  # zero-ring width (>= 3-conv halo; 4 keeps halo blocks 8-aligned)
HALO_ROWS = 8
PAD_TAIL = 32  # in-kernel zero tail: dx-slice overrun budget
#: per-layer output tail lengths (each consumer needs producer tail - 2)
TAILS = (16, 8, 0)


def _round16(n: int) -> int:
    return ((n + 15) // 16) * 16


def carry_enabled() -> bool:
    """Default for the forward kernels' tail-carry (skewed-band) pipeline
    (PDA_PALLAS_CARRY; see _kernel). ON by default: measured 29.4-29.5
    patches/s at the bench config together with the rt=16 forward tiles it
    unlocks, vs 28.6 for the round-4 defaults (v5e-1; carry removes the
    per-band halo recompute that previously made small tiles lose —
    25.7 -> 28.4 at rt=8)."""
    import os

    return os.environ.get("PDA_PALLAS_CARRY", "1") == "1"


def _carry_scratch(wp: int, c: int, dtype):
    """Per-layer trailing-row carry buffers: 6/4/2 rows of h1/h2/h3."""
    return [
        pltpu.VMEM((6 * wp, c), dtype),
        pltpu.VMEM((4 * wp, c), dtype),
        pltpu.VMEM((2 * wp, c), dtype),
    ]


def canvas_wp(w: int) -> int:
    return _round16(w + 2 * MARGIN)


def canvas_flat(x: jax.Array, wp: int) -> jax.Array:
    """(B, H, W, C) -> (B, (H+2*MARGIN)*wp, C) zero-ring flat canvas."""
    b, h, w, c = x.shape
    canvas = jnp.zeros((b, h + 2 * MARGIN, wp, c), x.dtype)
    canvas = jax.lax.dynamic_update_slice(canvas, x, (0, MARGIN, MARGIN, 0))
    return canvas.reshape(b, (h + 2 * MARGIN) * wp, c)


def band_views(rt: int, wp: int, channels: int):
    """(core, halo) BlockSpecs exposing overlapping rt+8 row bands of a flat
    canvas without duplicated HBM traffic. Requires rt % 8 == 0."""
    assert rt % HALO_ROWS == 0, rt
    core = pl.BlockSpec(
        (1, rt * wp, channels), lambda i, n: (i, n, 0),
        memory_space=pltpu.VMEM,
    )
    ratio = rt // HALO_ROWS
    halo = pl.BlockSpec(
        (1, HALO_ROWS * wp, channels), lambda i, n: (i, (n + 1) * ratio, 0),
        memory_space=pltpu.VMEM,
    )
    return core, halo


def assemble_band(core_ref, halo_ref, dtype):
    """core + halo + zero tail -> the (rt+8)*wp + PAD_TAIL flat band value."""
    zeros = jnp.zeros((PAD_TAIL, core_ref.shape[-1]), dtype)
    return jnp.concatenate([core_ref[0], halo_ref[0], zeros], axis=0)


def flat_views(rt: int, wp: int, lanes: int, nb: int):
    """(up, core, down) BlockSpecs reading a MARGIN-0 flat (B, nb*rt*wp, C)
    as the margin-4 band of image rows [n*rt - 4, n*rt + rt + 4): 4-row edge
    blocks with clamped indices; the clamped-in garbage at the first/last
    band is zero-masked in-kernel by :func:`assemble_flat_band`. Lets the
    backward stream the forward's flat outputs directly, with no row-padded
    canvas materialization in XLA."""
    assert rt % 4 == 0, rt
    r4 = rt // 4
    up = pl.BlockSpec(
        (1, 4 * wp, lanes),
        lambda i, n: (i, jnp.maximum(n * r4 - 1, 0), 0),
        memory_space=pltpu.VMEM,
    )
    core = pl.BlockSpec(
        (1, rt * wp, lanes), lambda i, n: (i, n, 0), memory_space=pltpu.VMEM
    )
    down = pl.BlockSpec(
        (1, 4 * wp, lanes),
        lambda i, n: (i, jnp.minimum((n + 1) * r4, nb * r4 - 1), 0),
        memory_space=pltpu.VMEM,
    )
    return up, core, down


def assemble_flat_band(up_ref, core_ref, dn_ref, n, nb, dtype):
    """Margin-4 band value from flat_views refs — identical content to the
    canvas-based assemble_band (zero top/bottom margins via the edge masks;
    zero ring columns provided by the forward's in-kernel output masks)."""
    up = jnp.where(n == 0, jnp.zeros_like(up_ref[0]), up_ref[0])
    dn = jnp.where(n == nb - 1, jnp.zeros_like(dn_ref[0]), dn_ref[0])
    zeros = jnp.zeros((PAD_TAIL, core_ref.shape[-1]), dtype)
    return jnp.concatenate(
        [up.astype(dtype), core_ref[0].astype(dtype), dn.astype(dtype), zeros],
        axis=0,
    )


def flat_m0(x: jax.Array, wp: int) -> jax.Array:
    """(B, H, W, C) -> the MARGIN-0 flat (B, H*wp, C) with zero ring columns
    — the layout the forward kernel emits (for standalone backward use)."""
    b, h, w, c = x.shape
    buf = jnp.zeros((b, h, wp, c), x.dtype)
    buf = jax.lax.dynamic_update_slice(buf, x, (0, 0, MARGIN, 0))
    return buf.reshape(b, h * wp, c)


def _regroup(w: jax.Array) -> jax.Array:
    """(3, 3, Cin, Cout) HWIO -> (3_dy, Cin, 3_dx*Cout) for the nocat stencil."""
    return jnp.transpose(w, (0, 2, 1, 3)).reshape(3, w.shape[2], 3 * w.shape[3])


def _kernel(
    *refs,
    rt: int, wp: int, h_img: int, w_img: int, dtype,
    save_intermediates: bool = False,
    flat_input: bool = False,
    flat_parts: int = 1,
    carry: bool = False,
):
    if flat_input:
        in_refs = refs[: 3 * flat_parts]
        refs = refs[3 * flat_parts:]
    else:
        xc_ref, xh_ref = refs[:2]
        refs = refs[2:]
    (w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref, o_ref, *rest) = refs
    if carry:
        c1_ref, c2_ref, c3_ref = rest[-3:]
        rest = rest[:-3]
    n = pl.program_id(1)  # band index within the image
    nb = pl.num_programs(1)

    def layer(h, w_ref, b_ref, l_out: int, tail: int, shift: int, mask: bool,
              p0: int = 0):
        n_out = l_out + tail
        cin = h.shape[-1]
        if 3 * cin <= 256:
            # Small-K dy-fold: 3 passes of K=cin < 128 cost 3 full MXU
            # flows; one K=3*cin pass costs ceil(3*cin/128) <= 2. The dy
            # slices share a sublane offset mod 8 (wp % 16 == 0).
            r = jax.lax.dot_general(
                jnp.concatenate(
                    [h[dy * wp : dy * wp + n_out + 2, :] for dy in (0, 1, 2)],
                    axis=-1,
                ),
                jnp.concatenate([w_ref[0], w_ref[1], w_ref[2]], axis=0),
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        else:
            r = jax.lax.dot_general(
                h[0 : n_out + 2, :], w_ref[0],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
            for dy in (1, 2):
                r = r + jax.lax.dot_general(
                    h[dy * wp : dy * wp + n_out + 2, :], w_ref[dy],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
        c = w_ref.shape[2] // 3
        acc = (r[0:n_out, 0:c] + r[1:n_out + 1, c:2 * c]
               + r[2:n_out + 2, 2 * c:3 * c])
        out = jnp.maximum(acc + b_ref[0][None, :], 0.0)
        if mask:
            # buffer index b holds canvas flat position q = b + p0 + shift;
            # this layer's canvas rows start at `shift`. ``p0``: start offset
            # of a partial (carry-mode fresh-region) computation within the
            # layer's full buffer — a whole number of rows.
            q = (jax.lax.broadcasted_iota(jnp.int32, (n_out, 1), 0)
                 + (p0 + shift))
            # exact floor(q / wp) without integer division (slow VPU op):
            # float multiply by 1/wp then one correction step; exact for
            # q < 2^24 (band flat sizes are ~1e6)
            qr = jnp.floor(q.astype(jnp.float32) * (1.0 / wp)).astype(jnp.int32)
            col = q - qr * wp
            fix = (col >= wp).astype(jnp.int32) - (col < 0).astype(jnp.int32)
            qr = qr + fix
            col = q - qr * wp
            row = qr + shift
            g_row = n * rt + row - MARGIN  # global image row
            valid = (
                (g_row >= 0) & (g_row < h_img)
                & (col >= MARGIN) & (col < w_img + MARGIN)
            )
            out = jnp.where(valid, out, 0.0)
        return out.astype(dtype)

    if flat_input:
        # margin-0 flat input (zero ring columns by the producer's contract)
        # through clamped three-view reads — identical band content. With
        # flat_parts > 1 the input arrives channel-SPLIT (e.g. a decoder
        # block's upsample + skip streams); the concat happens here in VMEM,
        # so the concatenated tensor never exists in HBM.
        parts = [
            assemble_flat_band(
                in_refs[3 * i], in_refs[3 * i + 1], in_refs[3 * i + 2],
                n, nb, dtype,
            )
            for i in range(flat_parts)
        ]
        x = parts[0] if flat_parts == 1 else jnp.concatenate(parts, axis=-1)
    else:
        x = assemble_band(xc_ref, xh_ref, dtype)
    if not carry:
        h1 = layer(x, w1_ref, b1_ref, (rt + 6) * wp, TAILS[0], 1, True)
        h2 = layer(h1, w2_ref, b2_ref, (rt + 4) * wp, TAILS[1], 2, True)
        # h3 IS masked: the flat pipeline feeds this output straight into
        # the next kernel / flat op, whose stencils rely on exact-zero ring
        # columns
        h3 = layer(h2, w3_ref, b3_ref, (rt + 2) * wp, TAILS[2], 3, True)
    else:
        # Tail-carry (skewed-band) pipeline: each layer's first rows come
        # from VMEM scratch carried over from the previous band (which
        # computed them as its own trailing rows), so each band runs exactly
        # rt fresh rows per layer instead of rt+6/rt+4/rt+2 — the per-band
        # halo recompute (~17% of forward MXU work at rt=32) is gone. The
        # assembled buffers are value-identical to the non-carry path's
        # h1/h2/h3. Requires sequential band iteration (guaranteed: no
        # 'parallel' dimension semantics are emitted, see _compiler_params)
        # and resets at n == 0 for each batch image via the head computes.
        @pl.when(n == 0)
        def _():  # head rows [0, 6) of h1 — only the first band computes them
            c1_ref[:] = layer(x, w1_ref, b1_ref, 6 * wp, 0, 1, True)

        h1 = jnp.concatenate(
            [c1_ref[:], layer(x[6 * wp :], w1_ref, b1_ref, rt * wp,
                              TAILS[0], 1, True, p0=6 * wp)],
            axis=0,
        )

        @pl.when(n == 0)
        def _():  # head rows [0, 4) of h2
            c2_ref[:] = layer(h1, w2_ref, b2_ref, 4 * wp, 0, 2, True)

        h2 = jnp.concatenate(
            [c2_ref[:], layer(h1[4 * wp :], w2_ref, b2_ref, rt * wp,
                              TAILS[1], 2, True, p0=4 * wp)],
            axis=0,
        )

        @pl.when(n == 0)
        def _():  # head rows [0, 2) of h3
            c3_ref[:] = layer(h2, w3_ref, b3_ref, 2 * wp, 0, 3, True)

        h3 = jnp.concatenate(
            [c3_ref[:], layer(h2[2 * wp :], w3_ref, b3_ref, rt * wp,
                              TAILS[2], 3, True, p0=2 * wp)],
            axis=0,
        )
    # own output rows [4, rt+4): slice the base-3 buffer at idx(3, 4, 0)
    o_ref[0] = h3[wp - 3 : wp - 3 + rt * wp, :]
    if save_intermediates:
        # band-owned rows [4, rt+4) of h1 (base 1) / h2 (base 2): the slices
        # land exactly on the margin-0 flat canvas (same as the main output)
        h1_ref, h2_ref = rest
        h1_ref[0] = h1[3 * wp - 1 : 3 * wp - 1 + rt * wp, :]
        h2_ref[0] = h2[2 * wp - 2 : 2 * wp - 2 + rt * wp, :]
    if carry:
        # hand this band's trailing rows to the next band (the last band of
        # an image updates too — harmless: the next image's n==0 heads
        # overwrite before any read)
        @pl.when(n < nb - 1)
        def _():
            c1_ref[:] = h1[rt * wp : (rt + 6) * wp]
            c2_ref[:] = h2[rt * wp : (rt + 4) * wp]
            c3_ref[:] = h3[rt * wp : (rt + 2) * wp]


def conv_block_fused_canvas(
    xc: jax.Array,  # (B, (H+8)*wp, Cin) flat canvas from canvas_flat
    h: int, w: int,
    w1, b1, w2, b2, w3, b3,
    *,
    row_tile: int = 16,
    interpret: bool = False,
    save_intermediates: bool = False,
    carry: bool | None = None,
):
    """Fused block forward on a prebuilt canvas. Returns the margin-0 flat
    output (B, H*wp, C), or (out, h1_m0, h2_m0) when ``save_intermediates``
    (the intermediates feed the backward kernel, skipping its recompute).
    Exposed so the custom VJP can reuse the canvas as a residual."""
    b = xc.shape[0]
    cin = xc.shape[-1]
    c = w1.shape[-1]
    rt = min(row_tile, h)
    assert h % rt == 0 and rt % HALO_ROWS == 0, (h, rt)
    nb = h // rt
    wp = canvas_wp(w)
    dtype = xc.dtype

    if carry is None:
        carry = carry_enabled()
    carry = bool(carry) and nb > 1
    kernel = functools.partial(
        _kernel, rt=rt, wp=wp, h_img=h, w_img=w, dtype=dtype,
        save_intermediates=save_intermediates, carry=carry,
    )
    core, halo = band_views(rt, wp, cin)
    wspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec(
        (1, rt * wp, c), lambda i, n: (i, n, 0), memory_space=pltpu.VMEM
    )
    oshape = jax.ShapeDtypeStruct((b, nb * rt * wp, c), dtype)
    out = pl.pallas_call(
        kernel,
        grid=(b, nb),
        in_specs=[core, halo, wspec, wspec, wspec, wspec, wspec, wspec],
        out_specs=(ospec, ospec, ospec) if save_intermediates else ospec,
        out_shape=(oshape, oshape, oshape) if save_intermediates else oshape,
        scratch_shapes=_carry_scratch(wp, c, dtype) if carry else [],
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(
        xc, xc,
        _regroup(w1.astype(dtype)), b1.astype(jnp.float32)[None, :],
        _regroup(w2.astype(dtype)), b2.astype(jnp.float32)[None, :],
        _regroup(w3.astype(dtype)), b3.astype(jnp.float32)[None, :],
    )
    return out


def conv_block_fused_flat(
    xf: jax.Array,  # (B, H*wp, Cin) margin-0 flat (zero ring columns)
    h: int, w: int,
    w1, b1, w2, b2, w3, b3,
    *,
    row_tile: int = 16,
    interpret: bool = False,
    save_intermediates: bool = False,
    carry: bool | None = None,
):
    """Fused block forward reading a MARGIN-0 flat directly (clamped
    three-view band reads — no margin-4 canvas is ever materialized in XLA).
    Returns the margin-0 flat output (plus flat h1, h2 when
    ``save_intermediates``). The input's ring columns must be zero (every
    producer in the flat pipeline — kernels, flat pool/upsample — masks them).
    """
    b = xf.shape[0]
    cin = xf.shape[-1]
    c = w1.shape[-1]
    rt = min(row_tile, h)
    assert h % rt == 0 and rt % HALO_ROWS == 0, (h, rt)
    nb = h // rt
    wp = canvas_wp(w)
    dtype = xf.dtype

    if carry is None:
        carry = carry_enabled()
    carry = bool(carry) and nb > 1
    kernel = functools.partial(
        _kernel, rt=rt, wp=wp, h_img=h, w_img=w, dtype=dtype,
        save_intermediates=save_intermediates, flat_input=True, carry=carry,
    )
    xup, xcore, xdown = flat_views(rt, wp, cin, nb)
    wspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec(
        (1, rt * wp, c), lambda i, n: (i, n, 0), memory_space=pltpu.VMEM
    )
    oshape = jax.ShapeDtypeStruct((b, nb * rt * wp, c), dtype)
    out = pl.pallas_call(
        kernel,
        grid=(b, nb),
        in_specs=[xup, xcore, xdown, wspec, wspec, wspec, wspec, wspec, wspec],
        out_specs=(ospec, ospec, ospec) if save_intermediates else ospec,
        out_shape=(oshape, oshape, oshape) if save_intermediates else oshape,
        scratch_shapes=_carry_scratch(wp, c, dtype) if carry else [],
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(
        xf, xf, xf,
        _regroup(w1.astype(dtype)), b1.astype(jnp.float32)[None, :],
        _regroup(w2.astype(dtype)), b2.astype(jnp.float32)[None, :],
        _regroup(w3.astype(dtype)), b3.astype(jnp.float32)[None, :],
    )
    return out


def conv_block_fused_flat_dual(
    xa: jax.Array,  # (B, H*wp, Ca) margin-0 flat (zero ring columns)
    xb: jax.Array,  # (B, H*wp, Cb) margin-0 flat (zero ring columns)
    h: int, w: int,
    w1, b1, w2, b2, w3, b3,
    *,
    row_tile: int = 16,
    interpret: bool = False,
    save_intermediates: bool = False,
    carry: bool | None = None,
):
    """Fused block forward whose input is the channel concat [xa | xb],
    assembled per band in VMEM — the concatenated (B, H*wp, Ca+Cb) tensor
    never materializes in HBM. Serves the decoder blocks, whose input is
    upsample(x) ++ skip (reference unet.py:36-44): the two streams feed the
    kernel directly. ``w1`` still has Cin = Ca + Cb (the parameter layout is
    unchanged). Returns the margin-0 flat output (+ flat h1, h2 when
    ``save_intermediates``)."""
    b = xa.shape[0]
    c = w1.shape[-1]
    rt = min(row_tile, h)
    assert h % rt == 0 and rt % HALO_ROWS == 0, (h, rt)
    nb = h // rt
    wp = canvas_wp(w)
    dtype = xa.dtype

    if carry is None:
        carry = carry_enabled()
    carry = bool(carry) and nb > 1
    kernel = functools.partial(
        _kernel, rt=rt, wp=wp, h_img=h, w_img=w, dtype=dtype,
        save_intermediates=save_intermediates, flat_input=True, flat_parts=2,
        carry=carry,
    )
    aup, acore, adown = flat_views(rt, wp, xa.shape[-1], nb)
    bup, bcore, bdown = flat_views(rt, wp, xb.shape[-1], nb)
    wspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec(
        (1, rt * wp, c), lambda i, n: (i, n, 0), memory_space=pltpu.VMEM
    )
    oshape = jax.ShapeDtypeStruct((b, nb * rt * wp, c), dtype)
    out = pl.pallas_call(
        kernel,
        grid=(b, nb),
        in_specs=[aup, acore, adown, bup, bcore, bdown,
                  wspec, wspec, wspec, wspec, wspec, wspec],
        out_specs=(ospec, ospec, ospec) if save_intermediates else ospec,
        out_shape=(oshape, oshape, oshape) if save_intermediates else oshape,
        scratch_shapes=_carry_scratch(wp, c, dtype) if carry else [],
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(
        xa, xa, xa, xb.astype(dtype), xb.astype(dtype), xb.astype(dtype),
        _regroup(w1.astype(dtype)), b1.astype(jnp.float32)[None, :],
        _regroup(w2.astype(dtype)), b2.astype(jnp.float32)[None, :],
        _regroup(w3.astype(dtype)), b3.astype(jnp.float32)[None, :],
    )
    return out


def uncanvas(out: jax.Array, h: int, w: int) -> jax.Array:
    """Kernel output (B, H*wp, C) with the core rows' ring columns -> (B,H,W,C)."""
    b, _, c = out.shape
    wp = canvas_wp(w)
    return out.reshape(b, h, wp, c)[:, :, MARGIN : MARGIN + w, :]


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
    if out_dtype is not None:
        x = x.astype(out_dtype)
    xc = canvas_flat(x, canvas_wp(w))
    out = conv_block_fused_canvas(
        xc, h, w, w1, b1, w2, b2, w3, b3,
        row_tile=row_tile, interpret=interpret,
    )
    return uncanvas(out, h, w)


def conv_block_weights(params):
    """(w1, b1, w2, b2, w3, b3) from a pda ConvBlock param subtree."""
    return (
        params["Conv_0"]["kernel"], params["Conv_0"]["bias"],
        params["Conv_1"]["kernel"], params["Conv_1"]["bias"],
        params["Conv_2"]["kernel"], params["Conv_2"]["bias"],
    )
