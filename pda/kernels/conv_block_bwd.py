"""Pallas TPU kernel: fused backward of the 3x(conv3x3+bias+relu) block.

Companion to pda.kernels.conv_block (forward). One kernel invocation per
(batch image, row band) computes, entirely in VMEM:

  * recompute of the two intermediate activations h1, h2 from the input band
    (cheaper than round-tripping them through HBM; +2 layer-passes of MXU
    work for -2 saved activation streams);
  * the relu-masked gradient chain da3 -> da2 -> da1 -> dx (dgrad convs with
    flipped, io-swapped kernels — same shifted-matmul stencil as forward);
  * per-band weight/bias gradient partials via huge-K dot_generals
    (dW tap (dy, dx) = sum over band-owned pixels of shifted-input x grad),
    summed over bands by XLA afterwards.

Banding: uniform zero-ring canvases with margin 4 (rows [4, H+4)); band n
loads rows [n*rt, n*rt + rt + 8) of x, g (upstream cotangent) and h3 (the
forward output). The "base-beta" flat-shift convention from the forward
kernel generalizes: a buffer with base b holds value(row, col) at flat index
(row - b)*Wp + col - b, which keeps every slice start non-negative and makes
all dy-shifts Wp-aligned (legal lane concats). Ownership: each band's weight
gradients sum over its own rt output rows only, so band partials tile the
image exactly; ring columns contribute zero because the g canvas has a zero
ring.

See the measurement history in pda/models/blocks.py: XLA's autodiff backward
for this chain was the dominant cost of the PUNet train step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .conv_block import (
    MARGIN,
    assemble_band,
    assemble_flat_band,
    band_views,
    canvas_flat,
    canvas_wp,
    flat_m0,
    flat_views,
)

from .conv_block import _compiler_params_bwd as _compiler_params



def _carry_scratch_bwd(wp: int, c: int, dtype):
    """da2/da1 leading-row carry buffers: 4/2 canvas rows
    (PDA_PALLAS_CARRY_BWD — shared with the packed backward family)."""
    return [pltpu.VMEM((4 * wp, c), dtype), pltpu.VMEM((2 * wp, c), dtype)]


def _prep_fwd(w: jax.Array) -> jax.Array:
    """(3, 3, Cin, Cout) HWIO -> (3_dy, Cin, 3_dx*Cout) for the nocat stencil."""
    return jnp.transpose(w, (0, 2, 1, 3)).reshape(3, w.shape[2], 3 * w.shape[3])


def _prep_dgrad(w: jax.Array) -> jax.Array:
    """Same prep for the input-gradient conv: spatially flipped, io swapped."""
    return _prep_fwd(jnp.flip(w, axis=(0, 1)).transpose(0, 1, 3, 2))


def _kernel(
    *allrefs,
    rt: int, wp: int, h_img: int, w_img: int, dtype,
    recompute: bool = True,
    flat_io: bool = False,
    flat_parts: int = 1,
    carry: bool = False,
):
    if carry:
        cda2_ref, cda1_ref = allrefs[-2:]
        allrefs = allrefs[:-2]
    if flat_io:
        x_refs = allrefs[: 3 * flat_parts]
        (gu_ref, gc_ref, gd_ref,
         h3u_ref, h3c_ref, h3d_ref, *refs) = allrefs[3 * flat_parts:]
    else:
        (xc_ref, xh_ref, gc_ref, gh_ref,
         h3u_ref, h3c_ref, h3d_ref, *refs) = allrefs
    if recompute:
        (wf1_ref, b1_ref, wf2_ref, b2_ref,
         wd1_ref, wd2_ref, wd3_ref, *refs) = refs
    else:
        (h1u_ref, h1c_ref, h1d_ref, h2u_ref, h2c_ref, h2d_ref,
         wd1_ref, wd2_ref, wd3_ref, *refs) = refs
    dx_refs = refs[:flat_parts]
    dw1_ref, db1_ref, dw2_ref, db2_ref, dw3_ref, db3_ref = refs[flat_parts:]
    n = pl.program_id(1)
    nb = pl.num_programs(1)

    def stencil(h, w_ref, l_out: int, off0: int, headroom: int):
        """nocat conv stencil: out[p] = sum_dy,dx h[p + off0 + dy*wp + dx] W.

        Returns the f32 accumulator of length l_out + headroom (caller adds
        bias/relu/mask and casts)."""
        n_out = l_out + headroom
        cout3 = w_ref.shape[2]
        r = jax.lax.dot_general(
            h[off0 : off0 + n_out + 2, :], w_ref[0],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        for dy in (1, 2):
            r = r + jax.lax.dot_general(
                h[off0 + dy * wp : off0 + dy * wp + n_out + 2, :], w_ref[dy],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        c = cout3 // 3
        return (r[0:n_out, 0:c] + r[1:n_out + 1, c:2 * c]
                + r[2:n_out + 2, 2 * c:3 * c])

    def img_mask(n_out: int, base: int):
        """1 inside the image (rows+cols), 0 elsewhere, for base-beta buffers."""
        q = jax.lax.broadcasted_iota(jnp.int32, (n_out, 1), 0) + base
        # exact floor(q / wp) via float reciprocal + correction (no int div)
        qr = jnp.floor(q.astype(jnp.float32) * (1.0 / wp)).astype(jnp.int32)
        col = q - qr * wp
        fix = (col >= wp).astype(jnp.int32) - (col < 0).astype(jnp.int32)
        qr = qr + fix
        col = q - qr * wp
        row = qr + base
        g_row = n * rt + row - MARGIN
        return ((g_row >= 0) & (g_row < h_img)
                & (col >= MARGIN) & (col < w_img + MARGIN))

    if flat_io:
        # x/g stream as margin-0 flats too (zero ring columns by contract:
        # kernels mask their outputs; flat pool/upsample matrices write
        # exact zeros at ring columns, and so do their transposes). With
        # flat_parts > 1, x arrives channel-split (decoder upsample + skip)
        # and is concatenated here in VMEM.
        xs = [
            assemble_flat_band(
                x_refs[3 * i], x_refs[3 * i + 1], x_refs[3 * i + 2],
                n, nb, dtype,
            )
            for i in range(flat_parts)
        ]
        x = xs[0] if flat_parts == 1 else jnp.concatenate(xs, axis=-1)
        g = assemble_flat_band(gu_ref, gc_ref, gd_ref, n, nb, dtype)
    else:
        x = assemble_band(xc_ref, xh_ref, dtype)
        g = assemble_band(gc_ref, gh_ref, dtype)
    # h3 (and h1/h2 below) stream straight from the forward's margin-0 flats
    # via clamped three-view reads — no row-padded canvases in XLA
    h3 = assemble_flat_band(h3u_ref, h3c_ref, h3d_ref, n, nb, dtype)

    # Per-buffer flat headrooms: each stencil consumer reads up to
    # off0 + 2*wp + len(consumer) + 2, so headrooms shrink by >= 2 down
    # each chain (band tail 32 -> h1 24 -> h2 16; da3 band -> da2 16 -> da1 8).
    l_h1 = (rt + 6) * wp
    l_h2 = (rt + 4) * wp
    l_da2 = (rt + 4) * wp
    l_da1 = (rt + 2) * wp
    if recompute:
        # ---- recompute h1 (base 1, rows [1, rt+7)), h2 (base 2, [2, rt+6))
        a1 = stencil(x, wf1_ref, l_h1, 0, 24)
        h1 = jnp.where(img_mask(l_h1 + 24, 1),
                       jnp.maximum(a1 + b1_ref[0][None, :], 0.0),
                       0.0).astype(dtype)
        a2 = stencil(h1, wf2_ref, l_h2, 0, 16)
        h2 = jnp.where(img_mask(l_h2 + 16, 2),
                       jnp.maximum(a2 + b2_ref[0][None, :], 0.0),
                       0.0).astype(dtype)
        h2_for_da2 = h2                       # base-2 buffer, len l_da2 + 16
        h1_for_da1 = h1[2 * wp + 2 : 2 * wp + 2 + l_da1 + 8, :]
        h1_wgrad, h1_wgrad_base = h1, 1
        h2_wgrad, h2_wgrad_base = h2, 2
    else:
        # ---- h1/h2 streamed from the forward (margin-0 flats, read as
        # base-0 margin-4 bands like x/g)
        h1b = assemble_flat_band(h1u_ref, h1c_ref, h1d_ref, n, nb, dtype)
        h2b = assemble_flat_band(h2u_ref, h2c_ref, h2d_ref, n, nb, dtype)
        h2_for_da2 = h2b[2 * wp + 2 : 2 * wp + 2 + l_da2 + 16, :]
        h1_for_da1 = h1b[3 * wp + 3 : 3 * wp + 3 + l_da1 + 8, :]
        h1_wgrad, h1_wgrad_base = h1b, 0
        h2_wgrad, h2_wgrad_base = h2b, 0

    # ---- gradient chain
    # da3 (base 0, full band): g * relu'(h3); g/h3 ring columns are zero
    da3 = jnp.where(h3.astype(jnp.float32) > 0.0, g, 0).astype(dtype)

    if not carry:
        # da2 (base 2): dgrad conv of da3 (base 0 -> off0 = wp+1); relu'(h2)
        r2 = stencil(da3, wd3_ref, l_da2, wp + 1, 16)
        da2 = (jnp.where(
            h2_for_da2.astype(jnp.float32) > 0.0, r2, 0.0)).astype(dtype)

        # da1 (base 3): dgrad of da2 (base 2 -> off0 = 0); relu' of h1
        r1 = stencil(da2, wd2_ref, l_da1, 0, 8)
        da1 = (jnp.where(
            h1_for_da1.astype(jnp.float32) > 0.0, r1, 0.0)).astype(dtype)
    else:
        # Tail-carry for the gradient chain (see conv_block._kernel): da2/
        # da1's leading rows come from VMEM scratch carried from the
        # previous band (exactly rt fresh rows per dgrad stencil instead of
        # rt+4/rt+2; dx is already exact-owned). No garbage-tail patch is
        # needed: every carried entry's stencil reads stay inside the
        # producer's valid band.
        @pl.when(n == 0)
        def _():
            head = stencil(da3, wd3_ref, 4 * wp, wp + 1, 0)
            cda2_ref[:] = jnp.where(
                h2_for_da2[: 4 * wp].astype(jnp.float32) > 0.0, head, 0.0
            ).astype(dtype)

        f2 = stencil(da3[4 * wp :], wd3_ref, rt * wp, wp + 1, 16)
        da2 = jnp.concatenate(
            [cda2_ref[:],
             jnp.where(
                 h2_for_da2[4 * wp : (rt + 4) * wp + 16].astype(
                     jnp.float32) > 0.0,
                 f2, 0.0).astype(dtype)],
            axis=0,
        )

        @pl.when(n == 0)
        def _():
            head = stencil(da2, wd2_ref, 2 * wp, 0, 0)
            cda1_ref[:] = jnp.where(
                h1_for_da1[: 2 * wp].astype(jnp.float32) > 0.0, head, 0.0
            ).astype(dtype)

        f1 = stencil(da2[2 * wp :], wd2_ref, rt * wp, 0, 8)
        da1 = jnp.concatenate(
            [cda1_ref[:],
             jnp.where(
                 h1_for_da1[2 * wp : (rt + 2) * wp + 8].astype(
                     jnp.float32) > 0.0,
                 f1, 0.0).astype(dtype)],
            axis=0,
        )

        @pl.when(n < nb - 1)
        def _():
            cda2_ref[:] = da2[rt * wp : (rt + 4) * wp]
            cda1_ref[:] = da1[rt * wp : (rt + 2) * wp]

    # dx (base 4, exactly the band's rt owned rows)
    l_dx = rt * wp
    rx = stencil(da1, wd1_ref, l_dx, 0, 0)
    if flat_io:
        # emit the margin-0 flat directly: F[j] = dx_b[j - 4] within every
        # band (positions j < 4 of a band are ring columns of its first row,
        # exact zeros; the 4 values dropped at the tail are the last row's
        # ring columns). With flat_parts > 1 the cotangent splits back into
        # the per-part streams (lane slices) — no XLA-side split needed.
        v = jnp.concatenate(
            [jnp.zeros((MARGIN, rx.shape[-1]), dtype),
             rx[: l_dx - MARGIN, :].astype(dtype)], axis=0)
        off = 0
        for ref in dx_refs:
            lanes = ref.shape[-1]
            ref[0] = v[:, off : off + lanes]
            off += lanes
    else:
        dx_refs[0][0] = rx.astype(dtype)

    # ---- weight/bias gradients over band-owned rows [4, rt+4), ACCUMULATED
    # in-kernel across the whole (batch, band) grid: the dw/db output blocks
    # have grid-constant index maps, so they stay resident in VMEM for the
    # entire kernel and are written back once — no (B, nb, ...) partial
    # tensors ever stream through HBM (they measured up to 226 MB per dw).
    first = (pl.program_id(0) == 0) & (n == 0)

    def wgrad(h_in, base_i: int, da, base_o: int, dw_ref, db_ref):
        own0 = (MARGIN - base_o) * wp - base_o
        da_own = da[own0 : own0 + rt * wp, :]
        g0 = (MARGIN - 1 - base_i) * wp - 1 - base_i
        gin = jnp.concatenate(
            [h_in[g0 + dy * wp : g0 + dy * wp + rt * wp + 2, :]
             for dy in range(3)], axis=1)
        for dx in range(3):
            val = jax.lax.dot_general(
                gin[dx : dx + rt * wp, :], da_own,
                (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
            dw_ref[0, 0, dx] = jnp.where(first, val, dw_ref[0, 0, dx] + val)
        dbv = jnp.sum(da_own.astype(jnp.float32), axis=0, keepdims=True)
        db_ref[0, 0] = jnp.where(first, dbv, db_ref[0, 0] + dbv)

    wgrad(h2_wgrad, h2_wgrad_base, da3, 0, dw3_ref, db3_ref)
    wgrad(h1_wgrad, h1_wgrad_base, da2, 2, dw2_ref, db2_ref)
    wgrad(x, 0, da1, 3, dw1_ref, db1_ref)


@functools.partial(jax.jit, static_argnames=("h", "w", "row_tile", "interpret"))
def conv_block_bwd_canvas(
    xc: jax.Array,   # (B, (H+8)*wp, Cin) margin-4 canvas of the fwd input
    h3f: jax.Array,  # (B, H*wp, C)       margin-0 fwd output flat
    gc: jax.Array,   # (B, (H+8)*wp, C)   margin-4 canvas of the cotangent
    h: int, w: int,
    w1: jax.Array, b1: jax.Array,
    w2: jax.Array, b2: jax.Array,
    w3: jax.Array,
    *,
    h1f=None, h2f=None,  # margin-0 flat fwd intermediates (skip recompute)
    row_tile: int = 16,
    interpret: bool = False,
):
    """Returns (dx, dw1, db1, dw2, db2, dw3, db3); dw in HWIO f32.

    h1f/h2f/h3f are the forward kernel's flat outputs as-is (the fwd masks
    their ring columns); they stream through clamped three-view band reads
    (flat_views), so no row-padded canvas is ever materialized in XLA."""
    b = xc.shape[0]
    cin = xc.shape[-1]
    c = w1.shape[-1]
    rt = min(row_tile, h)
    assert h % rt == 0, (h, rt)
    nb = h // rt
    wp = canvas_wp(w)
    dtype = xc.dtype
    recompute = h1f is None

    kernel = functools.partial(
        _kernel, rt=rt, wp=wp, h_img=h, w_img=w, dtype=dtype,
        recompute=recompute)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    xcore, xhalo = band_views(rt, wp, cin)
    gcore, ghalo = band_views(rt, wp, c)
    hup, hcore, hdown = flat_views(rt, wp, c, nb)

    out_shapes = (
        jax.ShapeDtypeStruct((b, nb * rt * wp, cin), dtype),        # dx
        jax.ShapeDtypeStruct((1, 1, 3, 3 * cin, c), jnp.float32),  # dw1
        jax.ShapeDtypeStruct((1, 1, 1, c), jnp.float32),            # db1
        jax.ShapeDtypeStruct((1, 1, 3, 3 * c, c), jnp.float32),     # dw2
        jax.ShapeDtypeStruct((1, 1, 1, c), jnp.float32),            # db2
        jax.ShapeDtypeStruct((1, 1, 3, 3 * c, c), jnp.float32),     # dw3
        jax.ShapeDtypeStruct((1, 1, 1, c), jnp.float32),            # db3
    )
    out_specs = (
        pl.BlockSpec((1, rt * wp, cin), lambda i, n: (i, n, 0),
                     memory_space=pltpu.VMEM),
        # dw/db: grid-constant index maps -> in-kernel accumulators that
        # stay VMEM-resident for the whole grid and write back once
        pl.BlockSpec((1, 1, 3, 3 * cin, c), lambda i, n: (0, 0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 1, c), lambda i, n: (0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 3, 3 * c, c), lambda i, n: (0, 0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 1, c), lambda i, n: (0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 3, 3 * c, c), lambda i, n: (0, 0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 1, c), lambda i, n: (0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    )

    if recompute:
        extra_specs = [vmem, vmem, vmem, vmem]
        extra_args = (
            _prep_fwd(w1.astype(dtype)), b1.astype(jnp.float32)[None, :],
            _prep_fwd(w2.astype(dtype)), b2.astype(jnp.float32)[None, :],
        )
    else:
        extra_specs = [hup, hcore, hdown, hup, hcore, hdown]
        extra_args = (h1f, h1f, h1f, h2f, h2f, h2f)
    outs = pl.pallas_call(
        kernel,
        grid=(b, nb),
        in_specs=[
            xcore, xhalo, gcore, ghalo, hup, hcore, hdown,
            *extra_specs, vmem, vmem, vmem,
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(
        xc, xc, gc, gc, h3f, h3f, h3f,
        *extra_args,
        _prep_dgrad(w1.astype(dtype)), _prep_dgrad(w2.astype(dtype)),
        _prep_dgrad(w3.astype(dtype)),
    )
    dx_b, dw1p, db1p, dw2p, db2p, dw3p, db3p = outs

    # dx: undo the base-4 flat shift, crop ring columns
    dx = jnp.pad(dx_b, ((0, 0), (MARGIN, 0), (0, 0)))[:, : nb * rt * wp, :]
    dx = dx.reshape(b, h, wp, cin)[:, :, MARGIN : MARGIN + w, :]

    def _dw(p, ci):
        # (B, nb, 3_dx, 3_dy*ci, c) partials -> HWIO (3_dy, 3_dx, ci, c)
        s = jnp.sum(p, axis=(0, 1))
        return s.reshape(3, 3, ci, c).transpose(1, 0, 2, 3)

    def _db(p):
        return jnp.sum(p, axis=(0, 1))[0]

    return (dx, _dw(dw1p, cin), _db(db1p), _dw(dw2p, c), _db(db2p),
            _dw(dw3p, c), _db(db3p))


@functools.partial(
    jax.jit, static_argnames=("h", "w", "row_tile", "interpret", "carry")
)
def conv_block_bwd_flat(
    xf: jax.Array,   # (B, H*wp, Cin) margin-0 flat of the fwd input
    h3f: jax.Array,  # (B, H*wp, C)   margin-0 fwd output flat
    gf: jax.Array,   # (B, H*wp, C)   margin-0 flat of the cotangent
    h1f: jax.Array, h2f: jax.Array,   # margin-0 flat fwd intermediates
    h: int, w: int,
    w1: jax.Array, b1: jax.Array,
    w2: jax.Array, b2: jax.Array,
    w3: jax.Array,
    *,
    row_tile: int = 16,
    interpret: bool = False,
    carry: bool | None = None,
):
    """Fully flat backward: every stream (x, g, h1..h3) is a margin-0 flat
    read through clamped three-view bands, and dx comes back as a margin-0
    flat too — zero canvas/uncanvas ops in XLA. Returns
    (dxf, dw1, db1, dw2, db2, dw3, db3); dw in HWIO f32."""
    b = xf.shape[0]
    cin = xf.shape[-1]
    c = w1.shape[-1]
    rt = min(row_tile, h)
    assert h % rt == 0, (h, rt)
    nb = h // rt
    wp = canvas_wp(w)
    dtype = xf.dtype

    if carry is None:
        from .conv_block_packed_bwd import carry_bwd_enabled

        carry = carry_bwd_enabled()
    carry = bool(carry) and nb > 1
    kernel = functools.partial(
        _kernel, rt=rt, wp=wp, h_img=h, w_img=w, dtype=dtype,
        recompute=False, flat_io=True, carry=carry)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    xup, xcore, xdown = flat_views(rt, wp, cin, nb)
    hup, hcore, hdown = flat_views(rt, wp, c, nb)

    out_shapes = (
        jax.ShapeDtypeStruct((b, nb * rt * wp, cin), dtype),        # dx flat
        jax.ShapeDtypeStruct((1, 1, 3, 3 * cin, c), jnp.float32),  # dw1
        jax.ShapeDtypeStruct((1, 1, 1, c), jnp.float32),            # db1
        jax.ShapeDtypeStruct((1, 1, 3, 3 * c, c), jnp.float32),     # dw2
        jax.ShapeDtypeStruct((1, 1, 1, c), jnp.float32),            # db2
        jax.ShapeDtypeStruct((1, 1, 3, 3 * c, c), jnp.float32),     # dw3
        jax.ShapeDtypeStruct((1, 1, 1, c), jnp.float32),            # db3
    )
    out_specs = (
        pl.BlockSpec((1, rt * wp, cin), lambda i, n: (i, n, 0),
                     memory_space=pltpu.VMEM),
        # dw/db: grid-constant index maps -> in-kernel accumulators that
        # stay VMEM-resident for the whole grid and write back once
        pl.BlockSpec((1, 1, 3, 3 * cin, c), lambda i, n: (0, 0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 1, c), lambda i, n: (0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 3, 3 * c, c), lambda i, n: (0, 0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 1, c), lambda i, n: (0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 3, 3 * c, c), lambda i, n: (0, 0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 1, c), lambda i, n: (0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    )

    outs = pl.pallas_call(
        kernel,
        grid=(b, nb),
        in_specs=[
            xup, xcore, xdown, hup, hcore, hdown, hup, hcore, hdown,
            hup, hcore, hdown, hup, hcore, hdown,
            vmem, vmem, vmem,
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=_carry_scratch_bwd(wp, c, dtype) if carry else [],
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(
        xf, xf, xf, gf, gf, gf, h3f, h3f, h3f,
        h1f, h1f, h1f, h2f, h2f, h2f,
        _prep_dgrad(w1.astype(dtype)), _prep_dgrad(w2.astype(dtype)),
        _prep_dgrad(w3.astype(dtype)),
    )
    dxf, dw1p, db1p, dw2p, db2p, dw3p, db3p = outs

    def _dw(p, ci):
        s = jnp.sum(p, axis=(0, 1))
        return s.reshape(3, 3, ci, c).transpose(1, 0, 2, 3)

    def _db(p):
        return jnp.sum(p, axis=(0, 1))[0]

    return (dxf, _dw(dw1p, cin), _db(db1p), _dw(dw2p, c), _db(db2p),
            _dw(dw3p, c), _db(db3p))


@functools.partial(jax.jit, static_argnames=("h", "w", "row_tile", "interpret", "carry"))
def conv_block_bwd_flat_dual(
    xaf: jax.Array,  # (B, H*wp, Ca) margin-0 flat of the fwd input part A
    xbf: jax.Array,  # (B, H*wp, Cb) margin-0 flat of the fwd input part B
    h3f: jax.Array,  # (B, H*wp, C)  margin-0 fwd output flat
    gf: jax.Array,   # (B, H*wp, C)  margin-0 flat of the cotangent
    h1f: jax.Array, h2f: jax.Array,  # margin-0 flat fwd intermediates
    h: int, w: int,
    w1: jax.Array, b1: jax.Array,
    w2: jax.Array, b2: jax.Array,
    w3: jax.Array,
    *,
    row_tile: int = 16,
    interpret: bool = False,
    carry: bool | None = None,
):
    """Backward of :func:`conv_block_fused_flat_dual`: the forward input is
    the channel concat [xa | xb] assembled per band in VMEM, and the input
    cotangent comes back SPLIT as (dxa, dxb) — neither the concatenated
    input nor its cotangent ever exists in HBM. Returns
    (dxaf, dxbf, dw1, db1, dw2, db2, dw3, db3); dw in HWIO f32 with
    Cin = Ca + Cb (the parameter layout is unchanged)."""
    b = xaf.shape[0]
    ca, cb = xaf.shape[-1], xbf.shape[-1]
    cin = ca + cb
    c = w1.shape[-1]
    rt = min(row_tile, h)
    assert h % rt == 0, (h, rt)
    nb = h // rt
    wp = canvas_wp(w)
    dtype = xaf.dtype

    if carry is None:
        from .conv_block_packed_bwd import carry_bwd_enabled

        carry = carry_bwd_enabled()
    carry = bool(carry) and nb > 1
    kernel = functools.partial(
        _kernel, rt=rt, wp=wp, h_img=h, w_img=w, dtype=dtype,
        recompute=False, flat_io=True, flat_parts=2, carry=carry)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    aup, acore, adown = flat_views(rt, wp, ca, nb)
    bup, bcore, bdown = flat_views(rt, wp, cb, nb)
    hup, hcore, hdown = flat_views(rt, wp, c, nb)

    out_shapes = (
        jax.ShapeDtypeStruct((b, nb * rt * wp, ca), dtype),         # dxa flat
        jax.ShapeDtypeStruct((b, nb * rt * wp, cb), dtype),         # dxb flat
        jax.ShapeDtypeStruct((1, 1, 3, 3 * cin, c), jnp.float32),   # dw1
        jax.ShapeDtypeStruct((1, 1, 1, c), jnp.float32),            # db1
        jax.ShapeDtypeStruct((1, 1, 3, 3 * c, c), jnp.float32),     # dw2
        jax.ShapeDtypeStruct((1, 1, 1, c), jnp.float32),            # db2
        jax.ShapeDtypeStruct((1, 1, 3, 3 * c, c), jnp.float32),     # dw3
        jax.ShapeDtypeStruct((1, 1, 1, c), jnp.float32),            # db3
    )
    out_specs = (
        pl.BlockSpec((1, rt * wp, ca), lambda i, n: (i, n, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, rt * wp, cb), lambda i, n: (i, n, 0),
                     memory_space=pltpu.VMEM),
        # dw/db: grid-constant index maps -> in-kernel accumulators
        pl.BlockSpec((1, 1, 3, 3 * cin, c), lambda i, n: (0, 0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 1, c), lambda i, n: (0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 3, 3 * c, c), lambda i, n: (0, 0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 1, c), lambda i, n: (0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 3, 3 * c, c), lambda i, n: (0, 0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 1, c), lambda i, n: (0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    )

    outs = pl.pallas_call(
        kernel,
        grid=(b, nb),
        in_specs=[
            aup, acore, adown, bup, bcore, bdown,
            hup, hcore, hdown, hup, hcore, hdown,
            hup, hcore, hdown, hup, hcore, hdown,
            vmem, vmem, vmem,
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=_carry_scratch_bwd(wp, c, dtype) if carry else [],
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(
        xaf, xaf, xaf, xbf, xbf, xbf, gf, gf, gf, h3f, h3f, h3f,
        h1f, h1f, h1f, h2f, h2f, h2f,
        _prep_dgrad(w1.astype(dtype)), _prep_dgrad(w2.astype(dtype)),
        _prep_dgrad(w3.astype(dtype)),
    )
    dxaf, dxbf, dw1p, db1p, dw2p, db2p, dw3p, db3p = outs

    def _dw(p, ci):
        s = jnp.sum(p, axis=(0, 1))
        return s.reshape(3, 3, ci, c).transpose(1, 0, 2, 3)

    def _db(p):
        return jnp.sum(p, axis=(0, 1))[0]

    return (dxaf, dxbf, _dw(dw1p, cin), _db(db1p), _dw(dw2p, c), _db(db2p),
            _dw(dw3p, c), _db(db3p))


@functools.partial(jax.jit, static_argnames=("row_tile", "interpret"))
def conv_block_bwd(
    x: jax.Array,   # (B, H, W, Cin) forward input
    h3: jax.Array,  # (B, H, W, C)   forward output
    g: jax.Array,   # (B, H, W, C)   upstream cotangent
    w1: jax.Array, b1: jax.Array,
    w2: jax.Array, b2: jax.Array,
    w3: jax.Array,
    *,
    row_tile: int = 16,
    interpret: bool = False,
):
    """Standalone entry: builds the canvases, then conv_block_bwd_canvas."""
    b, h, w, cin = x.shape
    wp = canvas_wp(w)
    xc = canvas_flat(x, wp)
    gc = canvas_flat(g.astype(x.dtype), wp)
    return conv_block_bwd_canvas(
        xc, flat_m0(h3, wp), gc, h, w, w1, b1, w2, b2, w3,
        row_tile=row_tile, interpret=interpret,
    )
