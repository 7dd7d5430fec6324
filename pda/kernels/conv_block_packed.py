"""Pallas TPU kernel: lane-PACKED fused 3x(conv3x3+bias+relu) block forward.

Variant of pda.kernels.conv_block for the ``Cout = 64`` block geometries
(the PUNet's level-0 blocks: backbone/prior/posterior first blocks and the
last decoder block — all at the full 512^2 resolution, the step's hottest
tensors). The base kernel streams (flat_positions, 64)-lane operands, which
wastes half of every 128-lane vector register (and half of every (8, 128)
VMEM tile moved over HBM), and runs (.., 64) @ (64, ..) contractions at half
MXU utilization. (In-program streaming rates, dispatch-free chained copies:
128-lane bf16 Pallas blocks ~425 GB/s vs XLA's ~620 — see the measurement
correction in IMPLEMENTATION_STATUS.md; earlier 137/205 GB/s figures were
floored by ~1 ms/dispatch through the axon tunnel.)

This kernel packs PAIRS of adjacent flat spatial positions into one 128-lane
row:

  * canvas: (H + 2*MARGIN) rows x Wp cols (Wp a multiple of 32) flattened
    and pair-packed to ((H+8) * wpp, 2*C) with wpp = Wp/2; row q holds
    channels of flat positions 2q (lanes [0, C)) and 2q+1 (lanes [C, 2C)).
  * a row shift of one image row is wpp packed rows (sublane-aligned:
    wpp % 16 == 0); the +-1-flat-position dx taps become +-1 PACKED-row
    shifts combined with a lane-half select (see the "mixed" operand below).
  * per conv layer and dy tap the stencil runs TWO (.., 2*Cin) @ (2*Cin,
    2*Cout) contractions (2*Cin = 2*Cout = 128 at the target geometry: full
    MXU): a CENTER matmul consuming pair P with the dual-half block weights
       Wc = [[W1, W0], [W2, W1]]   (rows: even/odd input half; cols:
                                    even/odd output half; Wk = tap k)
    and a MIXED matmul whose operand takes its even-half lanes from pair
    P+1 (holding flat position 2P+2) and its odd-half lanes from pair P-1
    (flat 2P-1):
       Wm = [[0, W2], [W0, 0]]
    Together: out[2P]   = W0 in[2P-1] + W1 in[2P]   + W2 in[2P+1]
              out[2P+1] = W0 in[2P]   + W1 in[2P+1] + W2 in[2P+2].
  * base convention (as in the unpacked kernel, in packed-row units): layer
    l's buffer holds value(row r, packed col cp) at index
    (r - l)*wpp + cp - l, which keeps every stencil slice offset at
    dy*wpp + {0, 1, 2} >= 0.
  * masking: with MARGIN and W even, a packed pair is either fully inside
    or fully outside the image, so the ring/garbage re-zeroing mask is a
    single per-packed-row predicate (no lane-half select).

Measured on v5e at the 512^2 1->64 block (B=2, bf16): ~1.9x the unpacked
kernel's forward throughput. The matching packed backward lives in
pda.kernels.conv_block_packed_bwd.

Reference semantics: prob_utils/my_models/unet_blocks.py DownConvBlock /
probabilistic_unet.py:44-63 (3x SAME conv3x3 + ReLU chains).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


from .conv_block import _compiler_params, carry_enabled

MARGIN = 4          # zero-ring width in flat positions (even, >= 3-conv halo)
HALO_IMG_ROWS = 8   # halo band height in image rows
PAD_TAIL = 24       # packed-row zero tail (>= 2*wpp overrun never happens;
                    # actual overrun budget is 17 packed rows)
TAILS = (16, 8, 0)  # per-layer packed-row output tails


def _round32(n: int) -> int:
    return ((n + 31) // 32) * 32


def _carry_scratch(wpp: int, c2: int, dtype):
    """Per-layer trailing-row carry buffers: 6/4/2 packed rows of h1/h2/h3."""
    return [
        pltpu.VMEM((6 * wpp, c2), dtype),
        pltpu.VMEM((4 * wpp, c2), dtype),
        pltpu.VMEM((2 * wpp, c2), dtype),
    ]


def packed_wpp(w: int) -> int:
    """Packed positions per canvas row (multiple of 16)."""
    return _round32(w + 2 * MARGIN) // 2


def canvas_packed(x: jax.Array, wpp: int) -> jax.Array:
    """(B, H, W, C) -> (B, (H+2*MARGIN)*wpp, 2C) pair-packed zero-ring canvas."""
    b, h, w, c = x.shape
    canvas = jnp.zeros((b, h + 2 * MARGIN, 2 * wpp, c), x.dtype)
    canvas = jax.lax.dynamic_update_slice(canvas, x, (0, MARGIN, MARGIN, 0))
    return canvas.reshape(b, (h + 2 * MARGIN) * wpp, 2 * c)


def uncanvas_packed(out: jax.Array, h: int, w: int) -> jax.Array:
    """Kernel output (B, H*wpp, 2C) -> (B, H, W, C) (crop ring columns)."""
    b, _, c2 = out.shape
    c = c2 // 2
    wpp = packed_wpp(w)
    img = out.reshape(b, h, 2 * wpp, c)
    return img[:, :, MARGIN : MARGIN + w, :]


def band_views_packed(rt: int, wpp: int, lanes: int):
    """(core, halo) BlockSpecs over the packed canvas; rt image rows/band."""
    assert rt % HALO_IMG_ROWS == 0, rt
    core = pl.BlockSpec(
        (1, rt * wpp, lanes), lambda i, n: (i, n, 0), memory_space=pltpu.VMEM
    )
    ratio = rt // HALO_IMG_ROWS
    halo = pl.BlockSpec(
        (1, HALO_IMG_ROWS * wpp, lanes),
        lambda i, n: (i, (n + 1) * ratio, 0),
        memory_space=pltpu.VMEM,
    )
    return core, halo


def assemble_band(core_ref, halo_ref, dtype):
    zeros = jnp.zeros((PAD_TAIL, core_ref.shape[-1]), dtype)
    return jnp.concatenate([core_ref[0], halo_ref[0], zeros], axis=0)


def flat_views(rt: int, wpp: int, lanes: int, nb: int):
    """(up, core, down) BlockSpecs reading a MARGIN-0 packed flat
    (B, nb*rt*wpp, lanes) as the margin-4 band of image rows
    [n*rt - 4, n*rt + rt + 4): 4-row edge blocks with clamped indices (the
    clamped-in garbage at the first/last band is zero-masked in-kernel by
    :func:`assemble_flat_band`). Lets the backward stream the forward's flat
    outputs directly — no row-padded canvas materialization in XLA."""
    assert rt % 4 == 0, rt
    r4 = rt // 4
    up = pl.BlockSpec(
        (1, 4 * wpp, lanes),
        lambda i, n: (i, jnp.maximum(n * r4 - 1, 0), 0),
        memory_space=pltpu.VMEM,
    )
    core = pl.BlockSpec(
        (1, rt * wpp, lanes), lambda i, n: (i, n, 0), memory_space=pltpu.VMEM
    )
    down = pl.BlockSpec(
        (1, 4 * wpp, lanes),
        lambda i, n: (i, jnp.minimum((n + 1) * r4, nb * r4 - 1), 0),
        memory_space=pltpu.VMEM,
    )
    return up, core, down


def assemble_flat_band(up_ref, core_ref, dn_ref, n, nb, dtype):
    """Margin-4 band value from flat_views refs: identical content to the
    canvas-based assemble_band (zero top/bottom margins via the edge masks;
    zero ring columns provided by the forward's in-kernel output masks)."""
    up = jnp.where(n == 0, jnp.zeros_like(up_ref[0]), up_ref[0])
    dn = jnp.where(n == nb - 1, jnp.zeros_like(dn_ref[0]), dn_ref[0])
    zeros = jnp.zeros((PAD_TAIL, core_ref.shape[-1]), dtype)
    return jnp.concatenate(
        [up.astype(dtype), core_ref[0].astype(dtype), dn.astype(dtype), zeros],
        axis=0,
    )


def image_views(rt: int, lanes: int, nb: int):
    """(up, core, down) BlockSpecs reading a DENSE image (B, H, W*Cin) as
    the band of image rows [n*rt - 4, n*rt + rt + 4): the raw network input
    streams into the kernel in its natural layout (full 128-aligned lanes),
    and the packed zero-ring canvas is assembled in VMEM per band — the
    tiny-lane packed flat the XLA entry build materializes (lane-padded
    (L, 2*Cin) tiles, ~2-3 ms/step in the round-4 trace) never exists in
    HBM. Edge blocks are 8 rows (the Mosaic sublane-tile minimum); the
    kernel uses the inner 4 of each."""
    assert rt % 8 == 0, rt
    r8 = rt // 8
    up = pl.BlockSpec(
        (1, 8, lanes),
        lambda i, n: (i, jnp.maximum(n * r8 - 1, 0), 0),
        memory_space=pltpu.VMEM,
    )
    core = pl.BlockSpec(
        (1, rt, lanes), lambda i, n: (i, n, 0), memory_space=pltpu.VMEM
    )
    down = pl.BlockSpec(
        (1, 8, lanes),
        lambda i, n: (i, jnp.minimum((n + 1) * r8, nb * r8 - 1), 0),
        memory_space=pltpu.VMEM,
    )
    return up, core, down


def assemble_image_band(up_ref, core_ref, dn_ref, n, nb, w_img: int,
                        cin: int, wpp: int, dtype):
    """Band of image rows -> the packed zero-ring flat band value (identical
    content to assemble_band over canvas_packed): pair-pack adjacent columns
    into lanes, insert the ring columns as exact zeros, zero the top/bottom
    margins via the edge masks, append the PAD_TAIL. The 8-row edge blocks
    cover image rows [n*rt-8, n*rt) / [(n+1)*rt, +8); the band needs the
    last/first 4."""
    up = jnp.where(n == 0, jnp.zeros_like(up_ref[0]), up_ref[0])[4:]
    dn = jnp.where(n == nb - 1, jnp.zeros_like(dn_ref[0]), dn_ref[0])[:4]
    rows = jnp.concatenate(
        [up.astype(dtype), core_ref[0].astype(dtype), dn.astype(dtype)],
        axis=0,
    )  # (rt+8, W*cin)
    r = rows.shape[0]
    # lane regroup: (R, W*cin) -> (R, W/2, 2*cin); element (q, e*cin + c)
    # is lane (2q + e)*cin + c — exactly the pair-packed channel order
    pairs = rows.reshape(r, w_img // 2, 2 * cin)
    m2 = MARGIN // 2
    pairs = jnp.pad(
        pairs, ((0, 0), (m2, wpp - w_img // 2 - m2), (0, 0))
    )
    x = pairs.reshape(r * wpp, 2 * cin)
    zeros = jnp.zeros((PAD_TAIL, 2 * cin), dtype)
    return jnp.concatenate([x, zeros], axis=0)


def pack_weights(w: jax.Array):
    """HWIO (3, 3, Cin, Cout) -> (Wc, Wm), each (3_dy, 2*Cin, 2*Cout)."""
    zeros = jnp.zeros_like(w[:, 0])
    wc = jnp.concatenate(
        [
            jnp.concatenate([w[:, 1], w[:, 0]], axis=-1),
            jnp.concatenate([w[:, 2], w[:, 1]], axis=-1),
        ],
        axis=-2,
    )
    wm = jnp.concatenate(
        [
            jnp.concatenate([zeros, w[:, 2]], axis=-1),
            jnp.concatenate([w[:, 0], zeros], axis=-1),
        ],
        axis=-2,
    )
    return wc, wm


def dec_perm(cu: int, cs: int):
    """Row permutation mapping the standard packed input-channel order
    [cat_e(cu+cs) | cat_o(cu+cs)] (cat = [up | skip]) to the decoder
    kernel's operand layout [up_e(cu) | up_o(cu) | skip_e(cs) | skip_o(cs)]
    — the layout the three input streams concatenate to at lane offsets
    (0, cu, 2cu), all 128-aligned at the real geometries.

    Returns (perm, inv): ``w_dec = w_std[perm]``; ``m_std = m_dec[inv]``."""
    cin = cu + cs
    perm = (
        list(range(0, cu))                 # up_e
        + list(range(cin, cin + cu))       # up_o
        + list(range(cu, cin))             # skip_e
        + list(range(cin + cu, 2 * cin))   # skip_o
    )
    inv = [0] * (2 * cin)
    for pos, std in enumerate(perm):
        inv[std] = pos
    return perm, inv


def dec_top_pred(cu: int, cs: int):
    """EVEN-flat-position lane predicate for the dec_perm operand layout."""

    def pred(lane):
        return (lane < cu) | ((lane >= 2 * cu) & (lane < 2 * cu + cs))

    return pred


def _make_stencil(wpp: int):
    def stencil(h, wc_ref, wm_ref, l_out: int, off0: int, headroom: int,
                top_pred=None):
        n_out = l_out + headroom
        cin2 = h.shape[-1]
        half = cin2 // 2
        lane = jax.lax.broadcasted_iota(jnp.int32, (n_out, cin2), 1)
        # which lanes hold EVEN flat positions (operand layout is the
        # standard [even-half | odd-half] pairing unless the caller runs a
        # permuted multi-part layout — see dec_perm)
        top = (lane < half) if top_pred is None else top_pred(lane)
        if 3 * cin2 <= 128:
            # Small-K fold (input-level blocks, Cin <= 21): each n-row MXU
            # pass costs the same flow time whether K is 4 or 128, so the
            # three dy contractions per operand kind are lane-concatenated
            # into ONE (n, 3*cin2) @ (3*cin2, 2C) pass — 6 passes -> 2.
            # (Concat is over dy only: those slices share a sublane offset
            # mod 8 since wpp % 16 == 0; mixing the +-1-offset left/right
            # slices in one concat is rejected by Mosaic.)
            centers, mixeds, wcs, wms = [], [], [], []
            for dy in (0, 1, 2):
                base = off0 + dy * wpp
                center = h[base + 1 : base + 1 + n_out, :]
                left = h[base : base + n_out, :]
                right = h[base + 2 : base + 2 + n_out, :]
                centers.append(center)
                mixeds.append(jnp.where(top, right, left))
                wcs.append(wc_ref[dy])
                wms.append(wm_ref[dy])
            r = jax.lax.dot_general(
                jnp.concatenate(centers, axis=-1),
                jnp.concatenate(wcs, axis=0),
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
            return r + jax.lax.dot_general(
                jnp.concatenate(mixeds, axis=-1),
                jnp.concatenate(wms, axis=0),
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        acc = None
        for dy in (0, 1, 2):
            base = off0 + dy * wpp
            center = h[base + 1 : base + 1 + n_out, :]
            left = h[base : base + n_out, :]
            right = h[base + 2 : base + 2 + n_out, :]
            mixed = jnp.where(top, right, left)
            r = jax.lax.dot_general(
                center, wc_ref[dy],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
            r = r + jax.lax.dot_general(
                mixed, wm_ref[dy],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
            acc = r if acc is None else acc + r
        return acc

    return stencil


def _make_img_mask(wpp: int, rt: int, h_img: int, w_img: int):
    """Per-packed-row validity for base-b buffers (W, MARGIN even => the two
    flat positions of a pair share one validity bit)."""

    def img_mask(n, n_out: int, base: int, p0: int = 0):
        # ``p0``: start offset of a partial (carry-mode fresh-region)
        # computation within the layer's full buffer (whole packed rows)
        q = (jax.lax.broadcasted_iota(jnp.int32, (n_out, 1), 0)
             + p0 + base * (wpp + 1))
        # exact floor(q / wpp) via float reciprocal + correction (no int div)
        qr = jnp.floor(q.astype(jnp.float32) * (1.0 / wpp)).astype(jnp.int32)
        cp = q - qr * wpp
        fix = (cp >= wpp).astype(jnp.int32) - (cp < 0).astype(jnp.int32)
        qr = qr + fix
        cp = q - qr * wpp
        g_row = n * rt + qr - MARGIN
        return (
            (g_row >= 0) & (g_row < h_img)
            & (cp >= MARGIN // 2) & (cp < w_img // 2 + MARGIN // 2)
        )

    return img_mask


def _kernel(
    *refs,
    rt: int, wpp: int, h_img: int, w_img: int, dtype,
    save_intermediates: bool = False,
    flat_input: bool = False,
    dec_parts=None,  # (cu, cs): input is (ue, uo, skip) streams, dec_perm layout
    carry: bool = False,
    image_cin: int = 0,  # >0: input is the dense image (B, H, W*cin)
):
    flat_parts = 3 if dec_parts else 1
    if image_cin:
        iu_ref, ic_ref, id_ref = refs[:3]
        refs = refs[3:]
    elif flat_input:
        in_refs = refs[: 3 * flat_parts]
        refs = refs[3 * flat_parts:]
    else:
        xc_ref, xh_ref = refs[:2]
        refs = refs[2:]
    (wc1_ref, wm1_ref, b1_ref,
     wc2_ref, wm2_ref, b2_ref,
     wc3_ref, wm3_ref, b3_ref,
     o_ref, *rest) = refs
    if carry:
        c1_ref, c2_ref, c3_ref = rest[-3:]
        rest = rest[:-3]
    n = pl.program_id(1)
    nb = pl.num_programs(1)
    stencil = _make_stencil(wpp)
    img_mask = _make_img_mask(wpp, rt, h_img, w_img)

    def layer(h, wc_ref, wm_ref, b_ref, l_out, tail, base, mask,
              top_pred=None, p0: int = 0):
        n_out = l_out + tail
        acc = stencil(h, wc_ref, wm_ref, l_out, 0, tail, top_pred=top_pred)
        out = jnp.maximum(acc + b_ref[0][None, :], 0.0)
        if mask:
            out = jnp.where(img_mask(n, n_out, base, p0), out, 0.0)
        return out.astype(dtype)

    top1 = None
    if image_cin:
        x = assemble_image_band(
            iu_ref, ic_ref, id_ref, n, nb, w_img, image_cin, wpp, dtype
        )
    elif flat_input:
        # margin-0 packed flat input (zero ring by the producer's contract).
        # With dec_parts the decoder's (upsample-even, upsample-odd, packed
        # skip) streams concatenate HERE in VMEM (dec_perm layout; weights
        # arrive row-permuted to match) — the concat never exists in HBM.
        parts = [
            assemble_flat_band(
                in_refs[3 * i], in_refs[3 * i + 1], in_refs[3 * i + 2],
                n, nb, dtype,
            )
            for i in range(flat_parts)
        ]
        x = parts[0] if flat_parts == 1 else jnp.concatenate(parts, axis=-1)
        if dec_parts:
            top1 = dec_top_pred(*dec_parts)
    else:
        x = assemble_band(xc_ref, xh_ref, dtype)
    if not carry:
        h1 = layer(x, wc1_ref, wm1_ref, b1_ref, (rt + 6) * wpp, TAILS[0], 1,
                   True, top_pred=top1)
        h2 = layer(h1, wc2_ref, wm2_ref, b2_ref, (rt + 4) * wpp, TAILS[1], 2,
                   True)
        # h3 IS masked: the flat pipeline feeds this output straight into
        # the next kernel / flat op, whose stencils rely on exact-zero ring
        # columns
        h3 = layer(h2, wc3_ref, wm3_ref, b3_ref, (rt + 2) * wpp, TAILS[2], 3,
                   True)
    else:
        # Tail-carry (skewed-band) pipeline — see conv_block._kernel: each
        # layer's leading rows come from VMEM scratch carried from the
        # previous band; each band computes exactly rt fresh rows/layer.
        @pl.when(n == 0)
        def _():
            c1_ref[:] = layer(x, wc1_ref, wm1_ref, b1_ref, 6 * wpp, 0, 1,
                              True, top_pred=top1)

        h1 = jnp.concatenate(
            [c1_ref[:], layer(x[6 * wpp :], wc1_ref, wm1_ref, b1_ref,
                              rt * wpp, TAILS[0], 1, True, top_pred=top1,
                              p0=6 * wpp)],
            axis=0,
        )

        @pl.when(n == 0)
        def _():
            c2_ref[:] = layer(h1, wc2_ref, wm2_ref, b2_ref, 4 * wpp, 0, 2,
                              True)

        h2 = jnp.concatenate(
            [c2_ref[:], layer(h1[4 * wpp :], wc2_ref, wm2_ref, b2_ref,
                              rt * wpp, TAILS[1], 2, True, p0=4 * wpp)],
            axis=0,
        )

        @pl.when(n == 0)
        def _():
            c3_ref[:] = layer(h2, wc3_ref, wm3_ref, b3_ref, 2 * wpp, 0, 3,
                              True)

        @pl.when(n != 0)
        def _():
            # The producer computed the carried h3's LAST entries from its
            # h2 tail, which reads past its x band — in the packed layout
            # one of those positions (packed col 2, the first in-image
            # pair) survives the ring mask, unlike the unpacked kernel
            # whose 4-col flat ring absorbs the whole garbage span.
            # Recompute the last 8 carried entries from THIS band's
            # (correct) assembled h2.
            c3_ref[2 * wpp - 8 :, :] = layer(
                h2[2 * wpp - 8 :], wc3_ref, wm3_ref, b3_ref, 8, 0, 3, True,
                p0=2 * wpp - 8,
            )

        h3 = jnp.concatenate(
            [c3_ref[:], layer(h2[2 * wpp :], wc3_ref, wm3_ref, b3_ref,
                              rt * wpp, TAILS[2], 3, True, p0=2 * wpp)],
            axis=0,
        )
    o_ref[0] = h3[wpp - 3 : wpp - 3 + rt * wpp, :]
    if save_intermediates:
        h1_ref, h2_ref = rest
        h1_ref[0] = h1[3 * wpp - 1 : 3 * wpp - 1 + rt * wpp, :]
        h2_ref[0] = h2[2 * wpp - 2 : 2 * wpp - 2 + rt * wpp, :]
    if carry:
        @pl.when(n < nb - 1)
        def _():
            c1_ref[:] = h1[rt * wpp : (rt + 6) * wpp]
            c2_ref[:] = h2[rt * wpp : (rt + 4) * wpp]
            c3_ref[:] = h3[rt * wpp : (rt + 2) * wpp]


def conv_block_packed_canvas(
    xc: jax.Array,  # (B, (H+8)*wpp, 2*Cin) packed canvas
    h: int, w: int,
    w1, b1, w2, b2, w3, b3,
    *,
    row_tile: int = 32,
    interpret: bool = False,
    save_intermediates: bool = False,
    carry: bool | None = None,
):
    """Fused packed block forward on a prebuilt canvas. Returns the packed
    margin-0 flat output (B, H*wpp, 2C) (plus packed h1, h2 flats when
    ``save_intermediates``)."""
    b = xc.shape[0]
    cin2 = xc.shape[-1]
    c = w1.shape[-1]
    rt = min(row_tile, h)
    assert h % rt == 0 and rt % HALO_IMG_ROWS == 0, (h, rt)
    nb = h // rt
    wpp = packed_wpp(w)
    dtype = xc.dtype

    if carry is None:
        carry = carry_enabled()
    carry = bool(carry) and nb > 1
    kernel = functools.partial(
        _kernel, rt=rt, wpp=wpp, h_img=h, w_img=w, dtype=dtype,
        save_intermediates=save_intermediates, carry=carry,
    )
    core, halo = band_views_packed(rt, wpp, cin2)
    wspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec(
        (1, rt * wpp, 2 * c), lambda i, n: (i, n, 0), memory_space=pltpu.VMEM
    )
    oshape = jax.ShapeDtypeStruct((b, nb * rt * wpp, 2 * c), dtype)

    packed = []
    for wk, bk in ((w1, b1), (w2, b2), (w3, b3)):
        wc, wm = pack_weights(wk.astype(dtype))
        packed += [wc, wm, jnp.tile(bk.astype(jnp.float32), 2)[None, :]]

    out = pl.pallas_call(
        kernel,
        grid=(b, nb),
        in_specs=[core, halo] + [wspec] * 9,
        out_specs=(ospec, ospec, ospec) if save_intermediates else ospec,
        out_shape=(oshape, oshape, oshape) if save_intermediates else oshape,
        scratch_shapes=_carry_scratch(wpp, 2 * c, dtype) if carry else [],
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(xc, xc, *packed)
    return out


def conv_block_packed_flat(
    xf: jax.Array,  # (B, H*wpp, 2*Cin) margin-0 packed flat (zero ring cols)
    h: int, w: int,
    w1, b1, w2, b2, w3, b3,
    *,
    row_tile: int = 32,
    interpret: bool = False,
    save_intermediates: bool = False,
    carry: bool | None = None,
):
    """Fused packed block forward reading a MARGIN-0 packed flat directly
    (clamped three-view band reads — no packed canvas in XLA). Returns the
    packed margin-0 flat output (plus packed h1, h2 when requested)."""
    b = xf.shape[0]
    cin2 = xf.shape[-1]
    c = w1.shape[-1]
    rt = min(row_tile, h)
    assert h % rt == 0 and rt % HALO_IMG_ROWS == 0, (h, rt)
    nb = h // rt
    wpp = packed_wpp(w)
    dtype = xf.dtype

    if carry is None:
        carry = carry_enabled()
    carry = bool(carry) and nb > 1
    kernel = functools.partial(
        _kernel, rt=rt, wpp=wpp, h_img=h, w_img=w, dtype=dtype,
        save_intermediates=save_intermediates, flat_input=True,
        carry=carry,
    )
    xup, xcore, xdown = flat_views(rt, wpp, cin2, nb)
    wspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec(
        (1, rt * wpp, 2 * c), lambda i, n: (i, n, 0), memory_space=pltpu.VMEM
    )
    oshape = jax.ShapeDtypeStruct((b, nb * rt * wpp, 2 * c), dtype)

    packed = []
    for wk, bk in ((w1, b1), (w2, b2), (w3, b3)):
        wc, wm = pack_weights(wk.astype(dtype))
        packed += [wc, wm, jnp.tile(bk.astype(jnp.float32), 2)[None, :]]

    out = pl.pallas_call(
        kernel,
        grid=(b, nb),
        in_specs=[xup, xcore, xdown] + [wspec] * 9,
        out_specs=(ospec, ospec, ospec) if save_intermediates else ospec,
        out_shape=(oshape, oshape, oshape) if save_intermediates else oshape,
        scratch_shapes=_carry_scratch(wpp, 2 * c, dtype) if carry else [],
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(xf, xf, xf, *packed)
    return out


def conv_block_packed_image(
    x_img: jax.Array,  # (B, H, W, Cin) — the raw network input
    h: int, w: int,
    w1, b1, w2, b2, w3, b3,
    *,
    row_tile: int = 32,
    interpret: bool = False,
    save_intermediates: bool = False,
    carry: bool | None = None,
):
    """Fused packed block forward reading the DENSE IMAGE directly: the
    band's packed zero-ring canvas is assembled in VMEM (image_views +
    assemble_image_band), so the tiny-lane packed input flat never exists
    in HBM. Output/intermediates are the standard packed margin-0 flats."""
    b, h_, w_, cin = x_img.shape
    assert (h_, w_) == (h, w), (x_img.shape, h, w)
    assert w % 2 == 0
    c = w1.shape[-1]
    rt = min(row_tile, h)
    assert h % rt == 0 and rt % HALO_IMG_ROWS == 0, (h, rt)
    nb = h // rt
    wpp = packed_wpp(w)
    dtype = x_img.dtype
    if carry is None:
        carry = carry_enabled()
    carry = bool(carry) and nb > 1

    kernel = functools.partial(
        _kernel, rt=rt, wpp=wpp, h_img=h, w_img=w, dtype=dtype,
        save_intermediates=save_intermediates, carry=carry, image_cin=cin,
    )
    xr = x_img.reshape(b, h, w * cin)
    iviews = image_views(rt, w * cin, nb)
    wspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec(
        (1, rt * wpp, 2 * c), lambda i, n: (i, n, 0), memory_space=pltpu.VMEM
    )
    oshape = jax.ShapeDtypeStruct((b, nb * rt * wpp, 2 * c), dtype)

    packed = []
    for wk, bk in ((w1, b1), (w2, b2), (w3, b3)):
        wc, wm = pack_weights(wk.astype(dtype))
        packed += [wc, wm, jnp.tile(bk.astype(jnp.float32), 2)[None, :]]

    out = pl.pallas_call(
        kernel,
        grid=(b, nb),
        in_specs=[*iviews] + [wspec] * 9,
        out_specs=(ospec, ospec, ospec) if save_intermediates else ospec,
        out_shape=(oshape, oshape, oshape) if save_intermediates else oshape,
        scratch_shapes=_carry_scratch(wpp, 2 * c, dtype) if carry else [],
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(xr, xr, xr, *packed)
    return out


def conv_block_packed_flat_dec(
    ue: jax.Array,   # (B, H*wpp, Cu) even-position upsample stream
    uo: jax.Array,   # (B, H*wpp, Cu) odd-position upsample stream
    skp: jax.Array,  # (B, H*wpp, 2*Cs) packed skip flat
    h: int, w: int,
    w1, b1, w2, b2, w3, b3,
    *,
    row_tile: int = 32,
    interpret: bool = False,
    save_intermediates: bool = False,
    carry: bool | None = None,
):
    """Packed fused decoder block forward whose input is the channel concat
    [upsample | skip] (reference unet.py:36-44) fed as THREE separate
    streams: the upsample's even/odd lane halves (the two W-contraction
    outputs of the flat upsample, never lane-concatenated) and the packed
    skip. The band concat happens in VMEM at 128-aligned lane offsets
    (dec_perm layout; w1's rows are permuted to match), so neither the
    packed upsample nor the concatenated input ever exists in HBM. Returns
    the standard packed margin-0 flat output (+ h1, h2 when requested)."""
    b = ue.shape[0]
    cu = ue.shape[-1]
    cs = skp.shape[-1] // 2
    c = w1.shape[-1]
    rt = min(row_tile, h)
    assert h % rt == 0 and rt % HALO_IMG_ROWS == 0, (h, rt)
    nb = h // rt
    wpp = packed_wpp(w)
    dtype = ue.dtype

    if carry is None:
        carry = carry_enabled()
    carry = bool(carry) and nb > 1
    kernel = functools.partial(
        _kernel, rt=rt, wpp=wpp, h_img=h, w_img=w, dtype=dtype,
        save_intermediates=save_intermediates, flat_input=True,
        dec_parts=(cu, cs), carry=carry,
    )
    uviews = flat_views(rt, wpp, cu, nb)
    sviews = flat_views(rt, wpp, 2 * cs, nb)
    wspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec(
        (1, rt * wpp, 2 * c), lambda i, n: (i, n, 0), memory_space=pltpu.VMEM
    )
    oshape = jax.ShapeDtypeStruct((b, nb * rt * wpp, 2 * c), dtype)

    perm, _ = dec_perm(cu, cs)
    packed = []
    for i, (wk, bk) in enumerate(((w1, b1), (w2, b2), (w3, b3))):
        wc, wm = pack_weights(wk.astype(dtype))
        if i == 0:
            wc, wm = wc[:, perm, :], wm[:, perm, :]
        packed += [wc, wm, jnp.tile(bk.astype(jnp.float32), 2)[None, :]]

    out = pl.pallas_call(
        kernel,
        grid=(b, nb),
        in_specs=[*uviews, *uviews, *sviews] + [wspec] * 9,
        out_specs=(ospec, ospec, ospec) if save_intermediates else ospec,
        out_shape=(oshape, oshape, oshape) if save_intermediates else oshape,
        scratch_shapes=_carry_scratch(wpp, 2 * c, dtype) if carry else [],
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(ue, ue, ue, uo.astype(dtype), uo.astype(dtype), uo.astype(dtype),
      skp.astype(dtype), skp.astype(dtype), skp.astype(dtype), *packed)
    return out


@functools.partial(
    jax.jit, static_argnames=("row_tile", "interpret", "out_dtype")
)
def conv_block_packed(
    x: jax.Array,  # (B, H, W, Cin)
    w1: jax.Array, b1: jax.Array,
    w2: jax.Array, b2: jax.Array,
    w3: jax.Array, b3: jax.Array,
    *,
    row_tile: int = 32,
    interpret: bool = False,
    out_dtype=None,
) -> jax.Array:
    """Packed fused ConvBlock forward (3x SAME conv3x3 + bias + relu)."""
    b, h, w, cin = x.shape
    if out_dtype is not None:
        x = x.astype(out_dtype)
    xc = canvas_packed(x, packed_wpp(w))
    out = conv_block_packed_canvas(
        xc, h, w, w1, b1, w2, b2, w3, b3,
        row_tile=row_tile, interpret=interpret,
    )
    return uncanvas_packed(out, h, w)
