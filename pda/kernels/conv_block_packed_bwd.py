"""Pallas TPU kernel: lane-packed fused backward of the 3x(conv3x3+relu) block.

Companion to pda.kernels.conv_block_packed (see its module docstring for the
pair-packed canvas layout, the center/mixed dual-matmul stencil and the base
convention). One kernel invocation per (batch image, row band) computes in
VMEM:

  * the relu-masked gradient chain da3 -> da2 -> da1 -> dx, with the dgrad
    convolutions (spatially flipped, io-swapped kernels) running the same
    packed center+mixed stencil as the forward;
  * per-band weight-gradient partials as lane-packed big-K contractions:
    for each dy tap, THREE row-shifted (rt*wpp, 2Ci)^T @ (rt*wpp, 2Co)
    matmuls M[s], s in {-1, 0, +1} packed rows around the tap's row offset.
    Each (dy, dx) HWIO tap is the sum of two QUADRANTS of these:
        dW[dy][0] = M[-1][bl] + M[0][tr]
        dW[dy][1] = M[ 0][tl] + M[0][br]
        dW[dy][2] = M[ 0][bl] + M[+1][tr]
    (quadrants of the (2Ci, 2Co) result: t/b = even/odd input half,
    l/r = even/odd cotangent half), because a flat-position shift of
    2s (+-1) decomposes into a packed-row shift s plus a lane-half swap.
  * bias-gradient partials (summed lane halves on the host side).

Two intermediate-activation modes (flat path):

  * streaming (default): the forward saves h1/h2 as packed margin-0 flats
    and the backward reads them through clamped three-view band reads;
  * ``recompute=True``: h1/h2 are recomputed IN-KERNEL from the x band with
    the forward stencil (the forward then skips writing them). At the
    input-level geometries (Cin <= 2) this trades ~2 almost-free MXU layers
    for ~4 full-tensor HBM streams per block — the x band is resident for
    dw1 anyway. Recomputed h1 sits at base 1 (tail 18), h2 at base 2 (tail
    16); both are exact on every row the gradient chain consumes (h1 valid
    on band rows [1, rt+7), used on [3, rt+5]; h2 valid on [2, rt+6), used
    on [2, rt+5]).

``need_dx=False`` additionally skips the input-cotangent chain (the dgrad
stencil and its full-tensor output) — for blocks whose input is the network
input, dx is discarded by the caller, but the kernel would otherwise still
compute and stream it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .conv_block_packed import (
    HALO_IMG_ROWS,
    MARGIN,
    PAD_TAIL,
    _make_img_mask,
    _make_stencil,
    assemble_band,
    assemble_flat_band,
    band_views_packed,
    canvas_packed,
    flat_views,
    pack_weights,
    packed_wpp,
)

from .conv_block import _compiler_params_bwd as _compiler_params



def carry_bwd_enabled() -> bool:
    """Default for the backward kernels' gradient-chain tail-carry
    (PDA_PALLAS_CARRY_BWD; see _kernel). Off until measured on hardware."""
    import os

    return os.environ.get("PDA_PALLAS_CARRY_BWD", "0") == "1"


def _carry_scratch_bwd(wpp: int, c2: int, dtype, need_dx: bool, dx_lanes: int):
    """da2/da1 (+ f32 dx) leading-row carry buffers: 5/3/(1) packed rows."""
    s = [pltpu.VMEM((5 * wpp, c2), dtype), pltpu.VMEM((3 * wpp, c2), dtype)]
    if need_dx:
        s.append(pltpu.VMEM((wpp, dx_lanes), jnp.float32))
    return s


def _prep_dgrad(w: jax.Array):
    """HWIO -> packed (Wc, Wm) blocks of the input-gradient conv (flipped,
    io-swapped kernel)."""
    return pack_weights(jnp.flip(w, axis=(0, 1)).transpose(0, 1, 3, 2))


def _kernel(
    *allrefs,
    rt: int, wpp: int, h_img: int, w_img: int, dtype,
    flat_io: bool = False,
    need_dx: bool = True,
    recompute: bool = False,
    dec_parts=None,  # (cu, cs): x is (ue, uo, skip) streams, dec_perm layout
    g_mode: str = "full",  # "full" | "pooled" | "both" — cotangent sources
    image_cin: int = 0,  # >0: x streams as the dense image (B, H, W*cin)
    carry: bool = False,
):
    flat_parts = 3 if dec_parts else 1
    if carry:
        n_scratch = 3 if need_dx else 2
        carry_refs = allrefs[-n_scratch:]
        allrefs = allrefs[:-n_scratch]
    if flat_io:
        x_refs = allrefs[: 3 * flat_parts]
        refs = allrefs[3 * flat_parts:]
        gu_ref = gc_ref = gd_ref = None
        gpu_ref = gpc_ref = gpd_ref = None
        if g_mode in ("full", "both"):
            (gu_ref, gc_ref, gd_ref, *refs) = refs
        if g_mode in ("pooled", "both"):
            (gpu_ref, gpc_ref, gpd_ref, *refs) = refs
    else:
        (xc_ref, xh_ref, gc_ref, gh_ref, *refs) = allrefs
    (h3u_ref, h3c_ref, h3d_ref, *refs) = refs
    if recompute:
        (wc1_ref, wm1_ref, b1_ref, wc2_ref, wm2_ref, b2_ref, *refs) = refs
    else:
        (h1u_ref, h1c_ref, h1d_ref, h2u_ref, h2c_ref, h2d_ref, *refs) = refs
    if need_dx:
        (wd1c_ref, wd1m_ref, *refs) = refs
    (wd2c_ref, wd2m_ref, wd3c_ref, wd3m_ref, *refs) = refs
    dx_refs = refs[: flat_parts if need_dx else 0]
    refs = refs[flat_parts if need_dx else 0:]
    (dw1_ref, db1_ref, dw2_ref, db2_ref, dw3_ref, db3_ref) = refs
    stencil = _make_stencil(wpp)
    n = pl.program_id(1)
    nb = pl.num_programs(1)

    if flat_io:
        if image_cin:
            # x streams as the dense image; the packed zero-ring band is
            # assembled in VMEM (matching the image-entry forward)
            from .conv_block_packed import assemble_image_band

            x = assemble_image_band(
                x_refs[0], x_refs[1], x_refs[2], n, nb, w_img, image_cin,
                wpp, dtype,
            )
        else:
            # x/g stream as margin-0 packed flats (zero ring cols by
            # contract). With dec_parts, x arrives as the decoder's three
            # input streams and concatenates here in VMEM (dec_perm layout,
            # matching the forward).
            xs = [
                assemble_flat_band(
                    x_refs[3 * i], x_refs[3 * i + 1], x_refs[3 * i + 2],
                    n, nb, dtype,
                )
                for i in range(flat_parts)
            ]
            x = xs[0] if flat_parts == 1 else jnp.concatenate(xs, axis=-1)
        g = None
        if g_mode in ("full", "both"):
            g = assemble_flat_band(gu_ref, gc_ref, gd_ref, n, nb, dtype)
        if g_mode in ("pooled", "both"):
            # The consumer of this block's output is a 2x2 avg pool: its
            # transposed op (broadcast rows+lanes, x0.25, ring re-zero) runs
            # HERE on the pooled cotangent instead of as an XLA broadcast —
            # the band reads (h/2, C) pooled rows (1/4 of the full-res
            # stream) and expands in VMEM with free leading-dim reshapes.
            c2 = h3c_ref.shape[-1]
            gp = assemble_flat_band(gpu_ref, gpc_ref, gpd_ref, n, nb, dtype)
            # pooled band rows [n*rt/2 - 4, n*rt/2 + rt/2 + 4); keep the
            # margin-2 window that expands to the full band's margin-4 rows
            gsel = gp[2 * wpp : (2 + rt // 2 + 4) * wpp, :]
            g3 = gsel.reshape(rt // 2 + 4, wpp, c2 // 2)
            g4 = jnp.broadcast_to(
                g3[:, None], (rt // 2 + 4, 2, wpp, c2 // 2)
            )
            gfull = g4.reshape((rt + 8) * wpp, c2 // 2)
            gpk = jnp.concatenate([gfull, gfull], axis=-1).astype(
                jnp.float32
            ) * 0.25
            # pool wrote pooled col j_packed+2 <- packed col pair j_packed:
            # the transpose reads the pooled flat 2 cols ahead
            gpk = jnp.concatenate(
                [gpk[2:], jnp.zeros((2, c2), jnp.float32)], axis=0
            )
            # the pool's pad-transpose drops ring cols; re-zero them (and
            # any clamped edge rows) so g keeps the zero-ring contract
            pool_mask = _make_img_mask(wpp, rt, h_img, w_img)
            gpk = jnp.where(pool_mask(n, (rt + 8) * wpp, 0), gpk, 0.0)
            gexp = jnp.concatenate(
                [gpk.astype(dtype), jnp.zeros((PAD_TAIL, c2), dtype)], axis=0
            )
            g = gexp if g is None else (g + gexp).astype(dtype)
    else:
        x = assemble_band(xc_ref, xh_ref, dtype)
        g = assemble_band(gc_ref, gh_ref, dtype)
    # h3 streams from the forward's margin-0 flat (canvas-free three-view
    # reads); content is identical to the old row-padded canvas
    h3 = assemble_flat_band(h3u_ref, h3c_ref, h3d_ref, n, nb, dtype)

    # Base chain 0 -> 1 -> 2 -> 3: unlike the unpacked kernel (margin 4 flat
    # positions >= any base) the packed column margin is only MARGIN/2 = 2
    # packed cols, so a base-4 dx buffer would push the first image pairs of
    # each band's first owned row to negative indices. Keeping every base
    # <= 3 and slicing owned rows at wpp - 3 (like the forward's h3) stays
    # in-range: value(r=4, cp=0) sits at j = wpp - 3.
    l_da2 = (rt + 5) * wpp
    l_da1 = (rt + 3) * wpp
    l_dx = (rt + 1) * wpp

    if recompute:
        # h1 (base 1) / h2 (base 2) from the resident x band via the forward
        # stencil — exact on every row the chain consumes (module docstring)
        img_mask = _make_img_mask(wpp, rt, h_img, w_img)

        def fwd_layer(hin, wc_ref, wm_ref, b_ref, l_out, tail, base):
            n_out = l_out + tail
            acc = stencil(hin, wc_ref, wm_ref, l_out, 0, tail)
            out = jnp.maximum(acc + b_ref[0][None, :], 0.0)
            out = jnp.where(img_mask(n, n_out, base), out, 0.0)
            return out.astype(dtype)

        h1_rc = fwd_layer(x, wc1_ref, wm1_ref, b1_ref, (rt + 6) * wpp, 18, 1)
        h2_rc = fwd_layer(
            h1_rc, wc2_ref, wm2_ref, b2_ref, (rt + 4) * wpp, 16, 2)
        # da2's base-1 buffer starts wpp+1 indices before base-2 h2; those
        # rows are never consumed downstream — zero-fill them (relu' = 0)
        h2_for_da2 = jnp.concatenate(
            [jnp.zeros((wpp + 1, h2_rc.shape[-1]), dtype),
             h2_rc[: l_da2 + 16 - (wpp + 1), :]],
            axis=0,
        )
        h1_for_da1 = h1_rc[(wpp + 1) : (wpp + 1) + l_da1 + 8, :]
        h1_wg, h1_base, h2_wg, h2_base = h1_rc, 1, h2_rc, 2
    else:
        # h1/h2 stream straight from the forward's margin-0 flats
        h1b = assemble_flat_band(h1u_ref, h1c_ref, h1d_ref, n, nb, dtype)
        h2b = assemble_flat_band(h2u_ref, h2c_ref, h2d_ref, n, nb, dtype)
        h2_for_da2 = h2b[(wpp + 1) : (wpp + 1) + l_da2 + 16, :]
        h1_for_da1 = h1b[2 * (wpp + 1) : 2 * (wpp + 1) + l_da1 + 8, :]
        h1_wg, h1_base, h2_wg, h2_base = h1b, 0, h2b, 0

    # da3 (base 0, full band): g * relu'(h3); ring lanes zero via g's ring
    da3 = jnp.where(h3.astype(jnp.float32) > 0.0, g, 0).astype(dtype)

    if not carry:
        # da2 (base 1): dgrad of da3 (base jump 1 -> off0 = 0); relu'(h2)
        r2 = stencil(da3, wd3c_ref, wd3m_ref, l_da2, 0, 16)
        da2 = jnp.where(
            h2_for_da2.astype(jnp.float32) > 0.0, r2, 0.0
        ).astype(dtype)

        # da1 (base 2): dgrad of da2 (jump 1 -> off0 = 0); relu'(h1)
        r1 = stencil(da2, wd2c_ref, wd2m_ref, l_da1, 0, 8)
        da1 = jnp.where(
            h1_for_da1.astype(jnp.float32) > 0.0, r1, 0.0
        ).astype(dtype)

        r_dx = (
            stencil(da1, wd1c_ref, wd1m_ref, l_dx, 0, 0) if need_dx else None
        )
    else:
        # Tail-carry for the gradient chain (see conv_block_packed._kernel):
        # each buffer's leading rows come from VMEM scratch carried from the
        # previous band; the band computes exactly rt fresh rows per dgrad
        # stencil instead of rt+5/rt+3/rt+1. Unlike the forward, NO
        # garbage-tail patch is needed: the da buffers are short enough
        # relative to the band that every carried entry's stencil reads stay
        # inside the producer's valid region.
        cda2_ref, cda1_ref = carry_refs[0], carry_refs[1]

        @pl.when(n == 0)
        def _():
            head = stencil(da3, wd3c_ref, wd3m_ref, 5 * wpp, 0, 0)
            cda2_ref[:] = jnp.where(
                h2_for_da2[: 5 * wpp].astype(jnp.float32) > 0.0, head, 0.0
            ).astype(dtype)

        f2 = stencil(da3[5 * wpp :], wd3c_ref, wd3m_ref, rt * wpp, 0, 16)
        da2 = jnp.concatenate(
            [cda2_ref[:],
             jnp.where(
                 h2_for_da2[5 * wpp : (rt + 5) * wpp + 16].astype(
                     jnp.float32) > 0.0,
                 f2, 0.0).astype(dtype)],
            axis=0,
        )

        @pl.when(n == 0)
        def _():
            head = stencil(da2, wd2c_ref, wd2m_ref, 3 * wpp, 0, 0)
            cda1_ref[:] = jnp.where(
                h1_for_da1[: 3 * wpp].astype(jnp.float32) > 0.0, head, 0.0
            ).astype(dtype)

        f1 = stencil(da2[3 * wpp :], wd2c_ref, wd2m_ref, rt * wpp, 0, 8)
        da1 = jnp.concatenate(
            [cda1_ref[:],
             jnp.where(
                 h1_for_da1[3 * wpp : (rt + 3) * wpp + 8].astype(
                     jnp.float32) > 0.0,
                 f1, 0.0).astype(dtype)],
            axis=0,
        )

        r_dx = None
        if need_dx:
            cdx_ref = carry_refs[2]

            @pl.when(n == 0)
            def _():
                cdx_ref[:] = stencil(
                    da1, wd1c_ref, wd1m_ref, wpp, 0, 0
                ).astype(jnp.float32)

            fdx = stencil(da1[wpp:], wd1c_ref, wd1m_ref, rt * wpp, 0, 0)
            r_dx = jnp.concatenate([cdx_ref[:], fdx], axis=0)

        @pl.when(n < nb - 1)
        def _():
            cda2_ref[:] = da2[rt * wpp : (rt + 5) * wpp]
            cda1_ref[:] = da1[rt * wpp : (rt + 3) * wpp]
            if need_dx:
                cdx_ref[:] = r_dx[rt * wpp : (rt + 1) * wpp]

    if need_dx:
        # dx (base 3): owned rows [4, rt+4) start at j = wpp - 3
        v = r_dx[wpp - 3 : wpp - 3 + rt * wpp, :].astype(dtype)
        # with dec_parts the dgrad weights' columns are dec_perm-permuted,
        # so v's lanes are already (d_ue | d_uo | d_skip-packed): the split
        # back into the three producer streams is three lane slices
        off = 0
        for ref in dx_refs:
            lanes = ref.shape[-1]
            ref[0] = v[:, off : off + lanes]
            off += lanes

    # ---- packed weight/bias gradients over owned rows [4, rt+4),
    # ACCUMULATED in-kernel across the whole (batch, band) grid: the dw/db
    # output blocks have grid-constant index maps, so they stay VMEM-resident
    # for the entire kernel and write back once — no (B, nb, ...) partial
    # tensors ever stream through HBM (up to 226 MB per dw at dec-U3).
    first = (pl.program_id(0) == 0) & (n == 0)

    def acc(ref, idx, val):
        ref[idx] = jnp.where(first, val, ref[idx] + val)

    def wgrad(h_in, base_i: int, da, base_o: int, dw_ref, db_ref):
        own0 = (MARGIN - base_o) * wpp - base_o
        da_own = da[own0 : own0 + rt * wpp, :]
        lanes = h_in.shape[-1]
        if 3 * lanes <= 128:
            # Small-lane fold (dw1 at input-level blocks): the nine
            # (rt*wpp, lanes)^T @ (rt*wpp, 2C) taps each flow rt*wpp rows
            # through the MXU for a tiny (lanes, 2C) result. Concatenating
            # the three dy slices per s-shift (equal sublane offsets:
            # wpp % 16 == 0) flows once per shift — 9 passes -> 3.
            for s_idx, s_off in enumerate((-1, 0, 1)):
                cols = []
                for dy in range(3):
                    start = (MARGIN + dy - 1 - base_i) * wpp - base_i + s_off
                    cols.append(h_in[start : start + rt * wpp, :])
                m = jax.lax.dot_general(
                    jnp.concatenate(cols, axis=-1), da_own,
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                for dy in range(3):
                    acc(dw_ref, (0, 0, dy * 3 + s_idx),
                        m[dy * lanes : (dy + 1) * lanes, :])
        else:
            for dy in range(3):
                for s_idx, s_off in enumerate((-1, 0, 1)):
                    start = (MARGIN + dy - 1 - base_i) * wpp - base_i + s_off
                    acc(dw_ref, (0, 0, dy * 3 + s_idx), jax.lax.dot_general(
                        h_in[start : start + rt * wpp, :], da_own,
                        (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ))
        acc(db_ref, (0, 0),
            jnp.sum(da_own.astype(jnp.float32), axis=0, keepdims=True))

    wgrad(h2_wg, h2_base, da3, 0, dw3_ref, db3_ref)
    wgrad(h1_wg, h1_base, da2, 1, dw2_ref, db2_ref)
    wgrad(x, 0, da1, 2, dw1_ref, db1_ref)


def _assemble_dw(p: jax.Array, ci: int, co: int) -> jax.Array:
    """(B, nb, 9, 2Ci, 2Co) packed partials -> HWIO (3, 3, ci, co) f32."""
    m = jnp.sum(p, axis=(0, 1)).reshape(3, 3, 2 * ci, 2 * co)
    tl = m[:, :, :ci, :co]
    tr = m[:, :, :ci, co:]
    bl = m[:, :, ci:, :co]
    br = m[:, :, ci:, co:]
    # s index: 0 -> -1, 1 -> 0, 2 -> +1 packed rows
    taps = [
        bl[:, 0] + tr[:, 1],   # dx = 0  (flat off = D - 1)
        tl[:, 1] + br[:, 1],   # dx = 1  (flat off = D)
        bl[:, 1] + tr[:, 2],   # dx = 2  (flat off = D + 1)
    ]
    return jnp.stack(taps, axis=1)  # (3_dy, 3_dx, ci, co)


@functools.partial(jax.jit, static_argnames=("h", "w", "row_tile", "interpret"))
def conv_block_packed_bwd_canvas(
    xc: jax.Array,   # (B, (H+8)*wpp, 2*Cin) packed canvas of the fwd input
    h3f: jax.Array,  # (B, H*wpp, 2*C) packed fwd output, MARGIN-0 flat
    gc: jax.Array,   # (B, (H+8)*wpp, 2*C) packed canvas of the cotangent
    h1f: jax.Array, h2f: jax.Array,  # packed margin-0 flat fwd intermediates
    h: int, w: int,
    w1: jax.Array, w2: jax.Array, w3: jax.Array,
    *,
    row_tile: int = 16,
    interpret: bool = False,
):
    """Returns (dx, dw1, db1, dw2, db2, dw3, db3); dw in HWIO f32.

    h1f/h2f/h3f are the forward kernel's flat outputs as-is (zero ring
    columns via the forward's in-kernel masks); they are streamed through
    clamped three-view band reads, so no row-padded canvas is ever built."""
    b = xc.shape[0]
    cin = xc.shape[-1] // 2
    c = w1.shape[-1]
    rt = min(row_tile, h)
    assert h % rt == 0 and rt % HALO_IMG_ROWS == 0, (h, rt)
    nb = h // rt
    wpp = packed_wpp(w)
    dtype = xc.dtype

    kernel = functools.partial(
        _kernel, rt=rt, wpp=wpp, h_img=h, w_img=w, dtype=dtype)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    xcore, xhalo = band_views_packed(rt, wpp, 2 * cin)
    gcore, ghalo = band_views_packed(rt, wpp, 2 * c)
    hup, hcore, hdown = flat_views(rt, wpp, 2 * c, nb)

    def dw_specs(ci):
        # grid-constant index maps: in-kernel accumulators, written back once
        return (
            pl.BlockSpec((1, 1, 9, 2 * ci, 2 * c),
                         lambda i, n: (0, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, 2 * c), lambda i, n: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        )

    def dw_shapes(ci):
        return (
            jax.ShapeDtypeStruct((1, 1, 9, 2 * ci, 2 * c), jnp.float32),
            jax.ShapeDtypeStruct((1, 1, 1, 2 * c), jnp.float32),
        )

    out_shapes = (
        jax.ShapeDtypeStruct((b, nb * rt * wpp, 2 * cin), dtype),
        *dw_shapes(cin), *dw_shapes(c), *dw_shapes(c),
    )
    out_specs = (
        pl.BlockSpec((1, rt * wpp, 2 * cin), lambda i, n: (i, n, 0),
                     memory_space=pltpu.VMEM),
        *dw_specs(cin), *dw_specs(c), *dw_specs(c),
    )

    wd = []
    for wk in (w1, w2, w3):
        wc, wm = _prep_dgrad(wk.astype(dtype))
        wd += [wc, wm]
    outs = pl.pallas_call(
        kernel,
        grid=(b, nb),
        in_specs=[
            xcore, xhalo, gcore, ghalo,
            hup, hcore, hdown, hup, hcore, hdown, hup, hcore, hdown,
            vmem, vmem, vmem, vmem, vmem, vmem,
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(xc, xc, gc, gc, h3f, h3f, h3f, h1f, h1f, h1f, h2f, h2f, h2f, *wd)
    dx_b, dw1p, db1p, dw2p, db2p, dw3p, db3p = outs

    # dx: the in-kernel owned-row slice already landed on the margin-0 packed
    # flat layout; unpack pairs and crop the ring columns
    dx = dx_b.reshape(b, h, 2 * wpp, cin)[:, :, MARGIN : MARGIN + w, :]

    def _db(p):
        s = jnp.sum(p, axis=(0, 1))[0]
        return s[:c] + s[c:]

    return (
        dx,
        _assemble_dw(dw1p, cin, c), _db(db1p),
        _assemble_dw(dw2p, c, c), _db(db2p),
        _assemble_dw(dw3p, c, c), _db(db3p),
    )


@functools.partial(
    jax.jit,
    static_argnames=("h", "w", "row_tile", "interpret", "need_dx",
                     "recompute", "carry"),
)
def conv_block_packed_bwd_flat(
    xf: jax.Array,   # (B, H*wpp, 2*Cin) margin-0 packed flat of the input
    h3f: jax.Array,  # (B, H*wpp, 2*C) packed fwd output flat
    gf: jax.Array,   # (B, H*wpp, 2*C) margin-0 packed flat of the cotangent
    h1f, h2f,        # packed margin-0 flats, or None when ``recompute``
    h: int, w: int,
    w1: jax.Array, w2: jax.Array, w3: jax.Array,
    *,
    b1: jax.Array = None, b2: jax.Array = None,  # fwd biases (recompute only)
    row_tile: int = 16,
    interpret: bool = False,
    need_dx: bool = True,
    recompute: bool = False,
    carry: bool | None = None,
    gpf: jax.Array = None,  # (B, (H/2)*wpp, C) pooled-consumer cotangent
):
    """Fully flat packed backward: x, g and the saved activations all stream
    as margin-0 packed flats, and dx comes back as one too (the kernel's
    owned-row slice already lands on that layout). Returns
    (dxf, dw1, db1, dw2, db2, dw3, db3); dw in HWIO f32.

    ``recompute=True`` recomputes h1/h2 in-kernel from the x band (pass
    h1f=h2f=None and the forward biases b1/b2). ``need_dx=False`` skips the
    input-cotangent chain entirely and returns dxf=None.

    ``gpf`` is the cotangent arriving through a 2x2 avg pool of this block's
    output (the unpacked margin-0 flat at the pooled geometry, which shares
    this kernel's row stride: packed_wpp(w) == canvas_wp(w//2) at the
    pipeline geometries). The pool's transpose (row/lane broadcast, x0.25,
    ring re-zero) runs in-kernel, so the XLA broadcast AND the full-res
    cotangent stream never exist when ``gf=None`` (pool-only consumers:
    the prior/posterior encoder chains). Pass both gf and gpf for a block
    whose output also has a direct consumer (the backbone's skip)."""
    b = xf.shape[0]
    cin = xf.shape[-1] // 2
    c = w1.shape[-1]
    rt = min(row_tile, h)
    assert h % rt == 0 and rt % HALO_IMG_ROWS == 0, (h, rt)
    nb = h // rt
    wpp = packed_wpp(w)
    dtype = xf.dtype
    assert gf is not None or gpf is not None
    g_mode = ("both" if gf is not None else "pooled") if gpf is not None \
        else "full"
    if gpf is not None:
        assert rt % 8 == 0 and gpf.shape[1] == (h // 2) * wpp, (
            gpf.shape, h, wpp)

    if carry is None:
        carry = carry_bwd_enabled()
    carry = bool(carry) and nb > 1 and not recompute
    kernel = functools.partial(
        _kernel, rt=rt, wpp=wpp, h_img=h, w_img=w, dtype=dtype, flat_io=True,
        need_dx=need_dx, recompute=recompute, g_mode=g_mode, carry=carry)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    xup, xcore, xdown = flat_views(rt, wpp, 2 * cin, nb)
    hup, hcore, hdown = flat_views(rt, wpp, 2 * c, nb)

    def dw_specs(ci):
        # grid-constant index maps: in-kernel accumulators, written back once
        return (
            pl.BlockSpec((1, 1, 9, 2 * ci, 2 * c),
                         lambda i, n: (0, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, 2 * c), lambda i, n: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        )

    def dw_shapes(ci):
        return (
            jax.ShapeDtypeStruct((1, 1, 9, 2 * ci, 2 * c), jnp.float32),
            jax.ShapeDtypeStruct((1, 1, 1, 2 * c), jnp.float32),
        )

    in_specs = [xup, xcore, xdown]
    inputs = [xf, xf, xf]
    if gf is not None:
        in_specs += [hup, hcore, hdown]  # g (2C lane spec)
        inputs += [gf, gf, gf]
    if gpf is not None:
        gpviews = flat_views(rt // 2, wpp, c, nb)
        in_specs += list(gpviews)
        inputs += [gpf, gpf, gpf]
    in_specs += [hup, hcore, hdown]  # h3
    inputs += [h3f, h3f, h3f]
    if recompute:
        for wk, bk in ((w1, b1), (w2, b2)):
            wc, wm = pack_weights(wk.astype(dtype))
            inputs += [wc, wm, jnp.tile(bk.astype(jnp.float32), 2)[None, :]]
            in_specs += [vmem, vmem, vmem]
    else:
        in_specs += [hup, hcore, hdown, hup, hcore, hdown]
        inputs += [h1f, h1f, h1f, h2f, h2f, h2f]
    dgrad_ws = (w1, w2, w3) if need_dx else (w2, w3)
    for wk in dgrad_ws:
        wc, wm = _prep_dgrad(wk.astype(dtype))
        inputs += [wc, wm]
        in_specs += [vmem, vmem]

    out_shapes = (*dw_shapes(cin), *dw_shapes(c), *dw_shapes(c))
    out_specs = (*dw_specs(cin), *dw_specs(c), *dw_specs(c))
    if need_dx:
        out_shapes = (
            jax.ShapeDtypeStruct((b, nb * rt * wpp, 2 * cin), dtype),
            *out_shapes,
        )
        out_specs = (
            pl.BlockSpec((1, rt * wpp, 2 * cin), lambda i, n: (i, n, 0),
                         memory_space=pltpu.VMEM),
            *out_specs,
        )

    outs = pl.pallas_call(
        kernel,
        grid=(b, nb),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=(
            _carry_scratch_bwd(wpp, 2 * c, dtype, need_dx, 2 * cin)
            if carry else []
        ),
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(*inputs)
    if need_dx:
        dxf, dw1p, db1p, dw2p, db2p, dw3p, db3p = outs
    else:
        dxf = None
        dw1p, db1p, dw2p, db2p, dw3p, db3p = outs

    def _db(p):
        s = jnp.sum(p, axis=(0, 1))[0]
        return s[:c] + s[c:]

    return (
        dxf,
        _assemble_dw(dw1p, cin, c), _db(db1p),
        _assemble_dw(dw2p, c, c), _db(db2p),
        _assemble_dw(dw3p, c, c), _db(db3p),
    )


@functools.partial(
    jax.jit,
    static_argnames=("h", "w", "row_tile", "interpret", "carry"),
)
def conv_block_packed_bwd_image(
    x_img: jax.Array,  # (B, H, W, Cin) — the raw network input
    h3f: jax.Array,    # (B, H*wpp, 2*C) packed fwd output flat
    gf,                # (B, H*wpp, 2*C) packed cotangent flat (or None)
    h1f, h2f,          # packed margin-0 flat fwd intermediates
    h: int, w: int,
    w1: jax.Array, w2: jax.Array, w3: jax.Array,
    *,
    row_tile: int = 16,
    interpret: bool = False,
    carry: bool | None = None,
    gpf=None,
):
    """Backward of :func:`conv_block_packed.conv_block_packed_image`: x
    streams as the dense image and its packed zero-ring band is assembled
    in VMEM for the dw1 weight gradient. Entry blocks have no input-
    cotangent consumer, so there is no dx output. Returns
    (dw1, db1, dw2, db2, dw3, db3); dw in HWIO f32. ``gf``/``gpf`` as in
    conv_block_packed_bwd_flat (full / pooled / both cotangent sources)."""
    from .conv_block_packed import image_views

    b, h_, w_, cin = x_img.shape
    assert (h_, w_) == (h, w)
    c = w1.shape[-1]
    rt = min(row_tile, h)
    assert h % rt == 0 and rt % HALO_IMG_ROWS == 0, (h, rt)
    nb = h // rt
    wpp = packed_wpp(w)
    dtype = x_img.dtype
    assert gf is not None or gpf is not None
    g_mode = ("both" if gf is not None else "pooled") if gpf is not None \
        else "full"
    if gpf is not None:
        assert rt % 8 == 0 and gpf.shape[1] == (h // 2) * wpp, (
            gpf.shape, h, wpp)

    if carry is None:
        carry = carry_bwd_enabled()
    carry = bool(carry) and nb > 1
    kernel = functools.partial(
        _kernel, rt=rt, wpp=wpp, h_img=h, w_img=w, dtype=dtype, flat_io=True,
        need_dx=False, recompute=False, g_mode=g_mode, image_cin=cin,
        carry=carry)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    iviews = image_views(rt, w * cin, nb)
    hup, hcore, hdown = flat_views(rt, wpp, 2 * c, nb)

    def dw_specs(ci):
        return (
            pl.BlockSpec((1, 1, 9, 2 * ci, 2 * c),
                         lambda i, n: (0, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, 2 * c), lambda i, n: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        )

    def dw_shapes(ci):
        return (
            jax.ShapeDtypeStruct((1, 1, 9, 2 * ci, 2 * c), jnp.float32),
            jax.ShapeDtypeStruct((1, 1, 1, 2 * c), jnp.float32),
        )

    xr = x_img.reshape(b, h, w * cin)
    in_specs = list(iviews)
    inputs = [xr, xr, xr]
    if gf is not None:
        in_specs += [hup, hcore, hdown]
        inputs += [gf, gf, gf]
    if gpf is not None:
        gpviews = flat_views(rt // 2, wpp, c, nb)
        in_specs += list(gpviews)
        inputs += [gpf, gpf, gpf]
    in_specs += [hup, hcore, hdown]  # h3
    inputs += [h3f, h3f, h3f]
    in_specs += [hup, hcore, hdown, hup, hcore, hdown]
    inputs += [h1f, h1f, h1f, h2f, h2f, h2f]
    for wk in (w2, w3):  # no dx chain: dgrad weights for da2/da1 only
        wc, wm = _prep_dgrad(wk.astype(dtype))
        inputs += [wc, wm]
        in_specs += [vmem, vmem]

    out_shapes = (*dw_shapes(cin), *dw_shapes(c), *dw_shapes(c))
    out_specs = (*dw_specs(cin), *dw_specs(c), *dw_specs(c))
    outs = pl.pallas_call(
        kernel,
        grid=(b, nb),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=(
            _carry_scratch_bwd(wpp, 2 * c, dtype, False, 0)
            if carry else []
        ),
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(*inputs)
    dw1p, db1p, dw2p, db2p, dw3p, db3p = outs

    def _db(p):
        s = jnp.sum(p, axis=(0, 1))[0]
        return s[:c] + s[c:]

    return (
        _assemble_dw(dw1p, cin, c), _db(db1p),
        _assemble_dw(dw2p, c, c), _db(db2p),
        _assemble_dw(dw3p, c, c), _db(db3p),
    )


@functools.partial(
    jax.jit, static_argnames=("h", "w", "row_tile", "interpret", "carry"),
)
def conv_block_packed_bwd_flat_dec(
    ue: jax.Array,   # (B, H*wpp, Cu) even-position upsample stream
    uo: jax.Array,   # (B, H*wpp, Cu) odd-position upsample stream
    skp: jax.Array,  # (B, H*wpp, 2*Cs) packed skip flat
    h3f: jax.Array,  # (B, H*wpp, 2*C) packed fwd output flat
    gf: jax.Array,   # (B, H*wpp, 2*C) packed cotangent flat
    h1f, h2f,        # packed margin-0 flat fwd intermediates
    h: int, w: int,
    w1: jax.Array, w2: jax.Array, w3: jax.Array,
    *,
    row_tile: int = 16,
    interpret: bool = False,
    carry: bool | None = None,
):
    """Backward of :func:`conv_block_packed.conv_block_packed_flat_dec`: the
    forward input concat [upsample | skip] is re-assembled per band in VMEM
    from the three streams, and the input cotangent comes back pre-SPLIT as
    (d_ue, d_uo, d_skip-packed) — the dgrad weights' columns carry the
    dec_perm permutation, so the split is three lane slices in-kernel.
    Returns (d_ue, d_uo, d_skp, dw1, db1, dw2, db2, dw3, db3); dw in HWIO
    f32 with Cin = Cu + Cs (the parameter layout is unchanged)."""
    from .conv_block_packed import dec_perm

    b = ue.shape[0]
    cu = ue.shape[-1]
    cs = skp.shape[-1] // 2
    cin = cu + cs
    c = w1.shape[-1]
    rt = min(row_tile, h)
    assert h % rt == 0 and rt % HALO_IMG_ROWS == 0, (h, rt)
    nb = h // rt
    wpp = packed_wpp(w)
    dtype = ue.dtype
    perm, inv = dec_perm(cu, cs)

    if carry is None:
        carry = carry_bwd_enabled()
    carry = bool(carry) and nb > 1
    kernel = functools.partial(
        _kernel, rt=rt, wpp=wpp, h_img=h, w_img=w, dtype=dtype, flat_io=True,
        need_dx=True, recompute=False, dec_parts=(cu, cs), carry=carry)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    uviews = flat_views(rt, wpp, cu, nb)
    sviews = flat_views(rt, wpp, 2 * cs, nb)
    hup, hcore, hdown = flat_views(rt, wpp, 2 * c, nb)

    def dw_specs(ci):
        return (
            pl.BlockSpec((1, 1, 9, 2 * ci, 2 * c),
                         lambda i, n: (0, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, 2 * c), lambda i, n: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        )

    def dw_shapes(ci):
        return (
            jax.ShapeDtypeStruct((1, 1, 9, 2 * ci, 2 * c), jnp.float32),
            jax.ShapeDtypeStruct((1, 1, 1, 2 * c), jnp.float32),
        )

    in_specs = [*uviews, *uviews, *sviews,
                hup, hcore, hdown, hup, hcore, hdown,    # g; h3
                hup, hcore, hdown, hup, hcore, hdown]    # h1; h2
    inputs = [ue, ue, ue, uo, uo, uo, skp, skp, skp,
              gf, gf, gf, h3f, h3f, h3f, h1f, h1f, h1f, h2f, h2f, h2f]
    for i, wk in enumerate((w1, w2, w3)):
        wc, wm = _prep_dgrad(wk.astype(dtype))
        if i == 0:
            # permute the OUTPUT lanes of the input-gradient conv so the
            # in-kernel dx slices land on the three producer streams
            wc, wm = wc[:, :, perm], wm[:, :, perm]
        inputs += [wc, wm]
        in_specs += [vmem, vmem]

    out_shapes = (
        jax.ShapeDtypeStruct((b, nb * rt * wpp, cu), dtype),      # d_ue
        jax.ShapeDtypeStruct((b, nb * rt * wpp, cu), dtype),      # d_uo
        jax.ShapeDtypeStruct((b, nb * rt * wpp, 2 * cs), dtype),  # d_skip
        *dw_shapes(cin), *dw_shapes(c), *dw_shapes(c),
    )
    out_specs = (
        pl.BlockSpec((1, rt * wpp, cu), lambda i, n: (i, n, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, rt * wpp, cu), lambda i, n: (i, n, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, rt * wpp, 2 * cs), lambda i, n: (i, n, 0),
                     memory_space=pltpu.VMEM),
        *dw_specs(cin), *dw_specs(c), *dw_specs(c),
    )

    outs = pl.pallas_call(
        kernel,
        grid=(b, nb),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=(
            _carry_scratch_bwd(wpp, 2 * c, dtype, True, 2 * cin)
            if carry else []
        ),
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(*inputs)
    due, duo, dskp, dw1p, db1p, dw2p, db2p, dw3p, db3p = outs

    def _db(p):
        s = jnp.sum(p, axis=(0, 1))[0]
        return s[:c] + s[c:]

    # dw1's input-channel rows are in dec_perm order: un-permute, then the
    # standard quadrant assembly applies
    dw1p_std = dw1p[:, :, :, jnp.asarray(inv), :]
    return (
        due, duo, dskp,
        _assemble_dw(dw1p_std, cin, c), _db(db1p),
        _assemble_dw(dw2p, c, c), _db(db2p),
        _assemble_dw(dw3p, c, c), _db(db3p),
    )


def flat_m0(x: jax.Array, wpp: int) -> jax.Array:
    """(B, H, W, C) -> the MARGIN-0 packed flat (B, H*wpp, 2C) with zero ring
    columns — the layout the forward kernel emits (for standalone use)."""
    b, h, w, c = x.shape
    buf = jnp.zeros((b, h, 2 * wpp, c), x.dtype)
    buf = jax.lax.dynamic_update_slice(buf, x, (0, 0, MARGIN, 0))
    return buf.reshape(b, h * wpp, 2 * c)


@functools.partial(jax.jit, static_argnames=("row_tile", "interpret"))
def conv_block_packed_bwd(
    x: jax.Array,   # (B, H, W, Cin) forward input
    h1: jax.Array, h2: jax.Array, h3: jax.Array,  # forward activations
    g: jax.Array,   # (B, H, W, C) upstream cotangent
    w1: jax.Array, w2: jax.Array, w3: jax.Array,
    *,
    row_tile: int = 16,
    interpret: bool = False,
):
    """Standalone entry: packs the canvases, then conv_block_packed_bwd_canvas."""
    b, h, w, cin = x.shape
    wpp = packed_wpp(w)
    xc = canvas_packed(x, wpp)
    gc = canvas_packed(g.astype(x.dtype), wpp)
    h1f = flat_m0(h1.astype(x.dtype), wpp)
    h2f = flat_m0(h2.astype(x.dtype), wpp)
    h3f = flat_m0(h3.astype(x.dtype), wpp)
    return conv_block_packed_bwd_canvas(
        xc, h3f, gc, h1f, h2f, h, w, w1, w2, w3,
        row_tile=row_tile, interpret=interpret,
    )
