"""Pallas kernel tests (interpreter mode on CPU): fused MC consensus must
match the XLA vmap path exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # multi-minute suite; default run skips, use --runslow

from pda.core import consensus_from_logits
from pda.models import ProbabilisticUnet
from pda.models.punet import mc_decode_logits
from pda.train.steps import _mc_pseudo

FILTERS = (4, 8, 12, 16)


def _setup(hw=32, batch=2):
    model = ProbabilisticUnet(
        num_filters=FILTERS, no_convs_fcomb=3, beta=1.0, rl_swap=True
    )
    x = jax.random.normal(jax.random.PRNGKey(5), (batch, hw, hw, 1))
    params = model.init(jax.random.PRNGKey(0), x, x)["params"]
    return model, params, x


class TestMCConsensusKernel:
    @pytest.mark.parametrize("masking", [False, True])
    @pytest.mark.parametrize("pack", [False, True])
    @pytest.mark.parametrize("batch_samples", [False, True])
    def test_matches_xla_path(self, masking, pack, batch_samples):
        from pda.kernels.mc_consensus import fcomb_tail_weights, mc_consensus_decode

        model, params, x = _setup()
        key = jax.random.PRNGKey(7)
        n = 8

        enc = model.apply({"params": params}, x, method="encode")
        feat_term = model.apply(
            {"params": params}, enc.features, method="decode_feature_term"
        )
        zs = enc.prior.sample_n(key, n)
        zp = params["fcomb"]["z_proj"]
        z_terms = zs @ zp["kernel"] + zp["bias"]
        mid_k, mid_b, last_k, last_b = fcomb_tail_weights(params["fcomb"])

        # XLA reference: vmapped decode + consensus reduction
        logits = mc_decode_logits(model, params, enc.features, enc.prior, key, n)
        ref_pseudo, ref_cons = consensus_from_logits(logits, masking=masking)

        # Pallas kernel (interpreter on CPU via force mode)
        from jax.experimental.pallas import tpu as pltpu

        with pltpu.force_tpu_interpret_mode():
            pseudo, cons = mc_consensus_decode(
                feat_term, z_terms, mid_k, mid_b, last_k, last_b,
                n_samples=n, masking=masking, row_tile=256, pack=pack,
                batch_samples=batch_samples,
            )

        np.testing.assert_allclose(pseudo, ref_pseudo, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(cons, ref_cons, rtol=1e-5, atol=1e-5)

    def test_fused_pseudo_matches_step_helper(self):
        from jax.experimental.pallas import tpu as pltpu

        from pda.kernels.mc_consensus import mc_pseudo_fused

        model, params, x = _setup()
        key = jax.random.PRNGKey(11)
        ref_y, ref_z = _mc_pseudo(model, params, x, key, 8, True)
        with pltpu.force_tpu_interpret_mode():
            y, z = mc_pseudo_fused(model, params, x, key, 8, True)
        np.testing.assert_allclose(y, ref_y, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(z, ref_z, rtol=1e-5, atol=1e-5)


class TestConvBlockKernel:
    @pytest.mark.parametrize("shape", [(2, 32, 16, 4), (1, 64, 32, 8)])
    def test_matches_flax_conv_block(self, shape):
        from pda.kernels.conv_block import conv_block_fused, conv_block_weights
        from pda.models.blocks import ConvBlock

        b, h, w, cin = shape
        block = ConvBlock(8, n_convs=3, pool=False)
        x = jax.random.normal(jax.random.PRNGKey(0), shape)
        params = block.init(jax.random.PRNGKey(1), x)["params"]
        ref = block.apply({"params": params}, x)
        out = conv_block_fused(
            x, *conv_block_weights(params), row_tile=16, interpret=True
        )
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)

    @pytest.mark.parametrize("entry", ["canvas", "flat", "dual"])
    def test_tail_carry_pipeline_bit_identical(self, entry):
        """PDA_PALLAS_CARRY (skewed-band tail-carry forward): the carried
        h1/h2/h3 rows reproduce the non-carry kernels EXACTLY — every entry
        point, multi-band grids, batch > 1 (n==0 reset), intermediates."""
        from pda.kernels import conv_block as cb

        h, w, cin, c, rt = 64, 48, 4, 8, 16
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.normal(size=(2, h, w, cin)).astype(np.float32))
        ws = []
        for ci, co in ((cin, c), (c, c), (c, c)):
            ws += [
                jnp.asarray(
                    rng.normal(size=(3, 3, ci, co)).astype(np.float32) * 0.2
                ),
                jnp.asarray(rng.normal(size=(co,)).astype(np.float32) * 0.1),
            ]
        wp = cb.canvas_wp(w)
        if entry == "canvas":
            xc = cb.canvas_flat(x, wp)
            run = lambda carry: (cb.conv_block_fused_canvas(  # noqa: E731
                xc, h, w, *ws, row_tile=rt, interpret=True, carry=carry
            ),)
        elif entry == "flat":
            xf = cb.flat_m0(x, wp)
            run = lambda carry: cb.conv_block_fused_flat(  # noqa: E731
                xf, h, w, *ws, row_tile=rt, interpret=True, carry=carry,
                save_intermediates=True,
            )
        else:
            xa, xb = cb.flat_m0(x[..., :2], wp), cb.flat_m0(x[..., 2:], wp)
            run = lambda carry: (cb.conv_block_fused_flat_dual(  # noqa: E731
                xa, xb, h, w, *ws, row_tile=rt, interpret=True, carry=carry
            ),)
        for a, b_ in zip(run(False), run(True)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))

    @pytest.mark.parametrize("entry", ["canvas", "flat", "dec"])
    def test_tail_carry_packed_bit_identical(self, entry):
        """Packed-kernel tail-carry — including the carried-h3 garbage-tail
        patch (the packed 2-col ring does NOT absorb the producer's tail
        garbage at packed col 2, unlike the unpacked 4-col ring)."""
        from pda.kernels import conv_block_packed as cp
        from pda.kernels.conv_block_packed_bwd import flat_m0

        h, w, cin, c, rt = 64, 64, 4, 8, 16
        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.normal(size=(2, h, w, cin)).astype(np.float32))
        wpp = cp.packed_wpp(w)

        def mk_ws(ci0):
            ws = []
            for ci, co in ((ci0, c), (c, c), (c, c)):
                ws += [
                    jnp.asarray(rng.normal(size=(3, 3, ci, co)).astype(
                        np.float32) * 0.2),
                    jnp.asarray(rng.normal(size=(co,)).astype(
                        np.float32) * 0.1),
                ]
            return ws

        if entry == "canvas":
            ws = mk_ws(cin)
            xc = cp.canvas_packed(x, wpp)
            run = lambda carry: (cp.conv_block_packed_canvas(  # noqa: E731
                xc, h, w, *ws, row_tile=rt, interpret=True, carry=carry
            ),)
        elif entry == "flat":
            ws = mk_ws(cin)
            xf = flat_m0(x, wpp)
            run = lambda carry: cp.conv_block_packed_flat(  # noqa: E731
                xf, h, w, *ws, row_tile=rt, interpret=True, carry=carry,
                save_intermediates=True,
            )
        else:
            cu, cs = 8, 4
            ws = mk_ws(cu + cs)
            ue = jnp.asarray(
                rng.normal(size=(2, h * wpp, cu)).astype(np.float32))
            uo = jnp.asarray(
                rng.normal(size=(2, h * wpp, cu)).astype(np.float32))
            skp = flat_m0(
                jnp.asarray(rng.normal(size=(2, h, w, cs)).astype(np.float32)),
                wpp)
            run = lambda carry: (cp.conv_block_packed_flat_dec(  # noqa: E731
                ue, uo, skp, h, w, *ws, row_tile=rt, interpret=True,
                carry=carry,
            ),)
        for a, b_ in zip(run(False), run(True)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))

    @pytest.mark.parametrize("cin", [1, 2])
    def test_image_entry_packed_matches_flat_entry(self, cin):
        """PDA_PALLAS_IMGIN forward kernel: the dense-image entry (packed
        canvas assembled in VMEM) is bit-identical to the packed-flat entry
        built by flat_ops.to_flat_packed in XLA."""
        from pda.kernels import conv_block_packed as cp
        from pda.kernels.conv_block_packed_bwd import flat_m0

        h, w, c, rt = 64, 64, 8, 16
        rng = np.random.default_rng(7)
        x = jnp.asarray(rng.normal(size=(2, h, w, cin)).astype(np.float32))
        ws = []
        for ci, co in ((cin, c), (c, c), (c, c)):
            ws += [
                jnp.asarray(
                    rng.normal(size=(3, 3, ci, co)).astype(np.float32) * 0.2
                ),
                jnp.asarray(rng.normal(size=(co,)).astype(np.float32) * 0.1),
            ]
        ref = cp.conv_block_packed_flat(
            flat_m0(x, cp.packed_wpp(w)), h, w, *ws, row_tile=rt,
            interpret=True, save_intermediates=True,
        )
        out = cp.conv_block_packed_image(
            x, h, w, *ws, row_tile=rt, interpret=True,
            save_intermediates=True,
        )
        for a, b_ in zip(ref, out):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))

    @pytest.mark.heavy
    def test_image_entry_model_grads_match(self, monkeypatch):
        """PDA_PALLAS_IMGIN end-to-end: identical loss AND parameter
        gradients through the full PUNet step (exercises the image-entry
        backward's in-VMEM dw1 canvas and the pool-fused entry variants on
        both the backbone and the 2-channel posterior)."""
        from jax.experimental.pallas import tpu as pltpu

        from pda.train.steps import _punet_loss

        model, params, x = _setup(hw=64, batch=1)
        segm = (jax.random.normal(jax.random.PRNGKey(3), x.shape) > 0
                ).astype(jnp.float32)
        key = jax.random.PRNGKey(11)
        monkeypatch.setenv("PDA_PALLAS_CONV", "1")

        def run(flag):
            monkeypatch.setenv("PDA_PALLAS_IMGIN", flag)
            with pltpu.force_tpu_interpret_mode():
                return jax.value_and_grad(
                    lambda p: _punet_loss(model, p, x, segm, key)[0]
                )(params)

        l0, g0 = run("0")
        l1, g1 = run("1")
        assert float(l0) == float(l1)
        for a, b_ in zip(
            jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))


class TestConvBlockBwdKernel:
    """Fused backward kernel (pda/kernels/conv_block_bwd.py) vs autodiff.

    Covers multiple bands, non-square frames, cin != cout, and the full
    custom-vjp wiring (conv3_relu_pallas) in interpret mode.
    """

    @pytest.mark.parametrize(
        "shape,c,rt",
        [((2, 32, 32, 4), 8, 8), ((1, 48, 40, 1), 8, 16), ((2, 16, 24, 8), 8, 16)],
    )
    def test_grads_match_autodiff(self, shape, c, rt):
        from pda.kernels.conv_block_bwd import conv_block_bwd

        b, h, w, cin = shape
        rng = np.random.default_rng(3)

        def conv(x, wk):
            return jax.lax.conv_general_dilated(
                x, wk, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        def block(x, w1, b1, w2, b2, w3, b3):
            hh = x
            for wk, bk in ((w1, b1), (w2, b2), (w3, b3)):
                hh = jnp.maximum(conv(hh, wk) + bk, 0.0)
            return hh

        x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
        ws, bs = [], []
        for (i, o) in [(cin, c), (c, c), (c, c)]:
            ws.append(jnp.asarray(rng.normal(size=(3, 3, i, o)).astype(np.float32)) * 0.2)
            bs.append(jnp.asarray(rng.normal(size=(o,)).astype(np.float32)) * 0.1)
        g = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))

        h3, vjp = jax.vjp(block, x, ws[0], bs[0], ws[1], bs[1], ws[2], bs[2])
        ref = vjp(g)
        out = conv_block_bwd(
            x, h3, g, ws[0], bs[0], ws[1], bs[1], ws[2],
            row_tile=rt, interpret=True,
        )
        for name, a, r in zip(
            ["dx", "dw1", "db1", "dw2", "db2", "dw3", "db3"], out, ref
        ):
            rel = float(jnp.abs(a - r).max() / (jnp.abs(r).max() + 1e-9))
            assert rel < 2e-5, (name, rel)

    def test_custom_vjp_wiring(self, monkeypatch):
        """conv3_relu_pallas (fwd kernel + bwd kernel via custom_vjp) agrees
        with the XLA conv3_relu custom VJP end to end."""
        from pda.models import blocks as blk

        # force-enable the pallas path and run its kernels interpreted
        monkeypatch.setenv("PDA_PALLAS_CONV", "1")
        import jax.experimental.pallas.tpu as _  # noqa: F401
        from jax.experimental.pallas import tpu as pltpu

        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.normal(size=(1, 16, 16, 4)).astype(np.float32))
        ws, bs = [], []
        for (i, o) in [(4, 8), (8, 8), (8, 8)]:
            ws.append(jnp.asarray(rng.normal(size=(3, 3, i, o)).astype(np.float32)) * 0.2)
            bs.append(jnp.asarray(rng.normal(size=(o,)).astype(np.float32)) * 0.1)

        def loss(fn):
            return lambda *a: jnp.sum(fn(*a) ** 2)

        args = (x, ws[0], bs[0], ws[1], bs[1], ws[2], bs[2])
        with pltpu.force_tpu_interpret_mode():
            gp = jax.grad(loss(blk.conv3_relu_pallas), argnums=(0, 1, 2))(*args)
        gx = jax.grad(loss(blk.conv3_relu), argnums=(0, 1, 2))(*args)
        # rtol headroom: the kernel's dy-folded layer-1 contraction sums in
        # a different f32 order than XLA's conv, which can flip borderline
        # relu masks at isolated positions (reassociation, not a bug)
        for a, r in zip(gp, gx):
            np.testing.assert_allclose(a, r, rtol=1e-3, atol=1e-5)


class TestConvBlockPackedKernels:
    """Lane-packed fused kernels (conv_block_packed[_bwd].py) vs references.

    The packed variants serve the Cout=64 level-0 geometries; these tests
    cover odd input channel counts (1/3/4), multiple bands, non-square
    frames, and the full custom-vjp wiring in interpret mode.
    """

    @pytest.mark.parametrize(
        "shape,c,rt",
        [((2, 32, 32, 1), 8, 16), ((1, 16, 48, 4), 8, 8), ((2, 24, 20, 3), 8, 8)],
    )
    def test_forward_matches_xla(self, shape, c, rt):
        from pda.kernels.conv_block_packed import conv_block_packed
        from pda.models.blocks import conv3_relu

        b, h, w, cin = shape
        rng = np.random.default_rng(11)
        x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
        ws, bs = [], []
        for (i, o) in [(cin, c), (c, c), (c, c)]:
            ws.append(jnp.asarray(rng.normal(size=(3, 3, i, o)).astype(np.float32)) * 0.2)
            bs.append(jnp.asarray(rng.normal(size=(o,)).astype(np.float32)) * 0.1)
        ref = conv3_relu(x, ws[0], bs[0], ws[1], bs[1], ws[2], bs[2])
        out = conv_block_packed(
            x, ws[0], bs[0], ws[1], bs[1], ws[2], bs[2],
            row_tile=rt, interpret=True,
        )
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)

    @pytest.mark.parametrize(
        "shape,c,rt",
        [((2, 32, 32, 1), 8, 16), ((1, 16, 48, 4), 8, 8), ((2, 24, 20, 3), 8, 8)],
    )
    def test_grads_match_autodiff(self, shape, c, rt):
        from pda.kernels.conv_block_packed_bwd import conv_block_packed_bwd
        from pda.models.blocks import _conv_same

        b, h, w, cin = shape
        rng = np.random.default_rng(13)
        x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
        ws, bs = [], []
        for (i, o) in [(cin, c), (c, c), (c, c)]:
            ws.append(jnp.asarray(rng.normal(size=(3, 3, i, o)).astype(np.float32)) * 0.2)
            bs.append(jnp.asarray(rng.normal(size=(o,)).astype(np.float32)) * 0.1)
        g = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))

        def block(x, w1, b1, w2, b2, w3, b3):
            hh = x
            for wk, bk in ((w1, b1), (w2, b2), (w3, b3)):
                hh = jnp.maximum(_conv_same(hh, wk) + bk, 0.0)
            return hh

        h3, vjp = jax.vjp(block, x, ws[0], bs[0], ws[1], bs[1], ws[2], bs[2])
        ref = vjp(g)
        h1 = jnp.maximum(_conv_same(x, ws[0]) + bs[0], 0.0)
        h2 = jnp.maximum(_conv_same(h1, ws[1]) + bs[1], 0.0)
        out = conv_block_packed_bwd(
            x, h1, h2, h3, g, ws[0], ws[1], ws[2],
            row_tile=rt, interpret=True,
        )
        for name, a, r in zip(
            ["dx", "dw1", "db1", "dw2", "db2", "dw3", "db3"], out, ref
        ):
            rel = float(jnp.abs(a - r).max() / (jnp.abs(r).max() + 1e-9))
            assert rel < 2e-5, (name, rel)

    def test_custom_vjp_wiring(self, monkeypatch):
        from jax.experimental.pallas import tpu as pltpu

        from pda.models import blocks as blk

        monkeypatch.setenv("PDA_PALLAS_CONV", "1")
        rng = np.random.default_rng(17)
        x = jnp.asarray(rng.normal(size=(1, 16, 16, 1)).astype(np.float32))
        ws, bs = [], []
        for (i, o) in [(1, 8), (8, 8), (8, 8)]:
            ws.append(jnp.asarray(rng.normal(size=(3, 3, i, o)).astype(np.float32)) * 0.2)
            bs.append(jnp.asarray(rng.normal(size=(o,)).astype(np.float32)) * 0.1)

        def loss(fn):
            return lambda *a: jnp.sum(fn(*a) ** 2)

        args = (x, ws[0], bs[0], ws[1], bs[1], ws[2], bs[2])
        with pltpu.force_tpu_interpret_mode():
            gp = jax.grad(loss(blk.conv3_relu_packed), argnums=(0, 1, 2))(*args)
        gx = jax.grad(loss(blk.conv3_relu), argnums=(0, 1, 2))(*args)
        for a, r in zip(gp, gx):
            np.testing.assert_allclose(a, r, rtol=1e-4, atol=1e-5)



class TestFlatKernelVariants:
    """Flat-I/O kernel variants (margin-0 flats in AND out — the layouts the
    flat activation pipeline keeps between blocks) against the XLA block."""

    def _mk(self, shape, c, seed):
        rng = np.random.default_rng(seed)
        b, h, w, cin = shape
        x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
        ws, bs = [], []
        for (i, o) in [(cin, c), (c, c), (c, c)]:
            ws.append(
                jnp.asarray(rng.normal(size=(3, 3, i, o)).astype(np.float32)) * 0.2
            )
            bs.append(jnp.asarray(rng.normal(size=(o,)).astype(np.float32)) * 0.1)
        g = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))
        return x, ws, bs, g

    @pytest.mark.parametrize(
        "shape,c,rt", [((2, 32, 32, 4), 8, 8), ((1, 48, 40, 1), 8, 16)]
    )
    def test_flat_forward_unpacked(self, shape, c, rt):
        from pda.kernels.conv_block import (
            canvas_wp, conv_block_fused_flat, flat_m0, uncanvas,
        )
        from pda.models.blocks import conv3_relu

        x, ws, bs, _ = self._mk(shape, c, 21)
        b, h, w, cin = shape
        ref = conv3_relu(x, ws[0], bs[0], ws[1], bs[1], ws[2], bs[2])
        xf = flat_m0(x, canvas_wp(w))
        outf = conv_block_fused_flat(
            xf, h, w, ws[0], bs[0], ws[1], bs[1], ws[2], bs[2],
            row_tile=rt, interpret=True,
        )
        np.testing.assert_allclose(uncanvas(outf, h, w), ref, rtol=1e-4, atol=1e-5)

    @pytest.mark.parametrize(
        "shape,c,rt", [((2, 32, 32, 4), 8, 8), ((1, 48, 40, 1), 8, 16)]
    )
    def test_flat_backward_unpacked(self, shape, c, rt):
        from pda.kernels.conv_block import canvas_wp, flat_m0, uncanvas
        from pda.kernels.conv_block_bwd import conv_block_bwd_flat
        from pda.models.blocks import _conv_same

        x, ws, bs, g = self._mk(shape, c, 23)
        b, h, w, cin = shape

        def block(x, w1, b1, w2, b2, w3, b3):
            hh = x
            for wk, bk in ((w1, b1), (w2, b2), (w3, b3)):
                hh = jnp.maximum(_conv_same(hh, wk) + bk, 0.0)
            return hh

        h3, vjp = jax.vjp(block, x, ws[0], bs[0], ws[1], bs[1], ws[2], bs[2])
        ref = vjp(g)
        h1 = jnp.maximum(_conv_same(x, ws[0]) + bs[0], 0.0)
        h2 = jnp.maximum(_conv_same(h1, ws[1]) + bs[1], 0.0)
        wp = canvas_wp(w)
        out = conv_block_bwd_flat(
            flat_m0(x, wp), flat_m0(h3, wp), flat_m0(g, wp),
            flat_m0(h1, wp), flat_m0(h2, wp),
            h, w, ws[0], bs[0], ws[1], bs[1], ws[2],
            row_tile=rt, interpret=True,
        )
        outs = (uncanvas(out[0], h, w),) + out[1:]
        for name, a, r in zip(
            ["dx", "dw1", "db1", "dw2", "db2", "dw3", "db3"], outs, ref
        ):
            rel = float(jnp.abs(a - r).max() / (jnp.abs(r).max() + 1e-9))
            assert rel < 2e-5, (name, rel)

    @pytest.mark.parametrize(
        "shape,ca,cb,c", [((2, 32, 32, 12), 8, 4, 8),
                          ((1, 16, 48, 6), 2, 4, 8)]
    )
    def test_flat_dual_input_matches_concat(self, shape, ca, cb, c):
        """The dual-input kernels (decoder upsample + skip fed as separate
        streams, concat in VMEM) must equal the single-input flat kernels on
        the concatenated input — forward and every gradient."""
        from pda.kernels.conv_block import canvas_wp, flat_m0
        from pda.models.blocks import conv3_relu_flat, conv3_relu_flat_dual

        x, ws, bs, _ = self._mk(shape, c, 29)
        b, h, w, cin = shape
        assert cin == ca + cb
        wp = canvas_wp(w)
        xaf = flat_m0(x[..., :ca], wp)
        xbf = flat_m0(x[..., ca:], wp)
        catf = jnp.concatenate([xaf, xbf], axis=-1)

        def f_cat(xaf, xbf, *wargs):
            out = conv3_relu_flat(
                h, w, jnp.concatenate([xaf, xbf], -1), *wargs
            )
            return jnp.sum(out * jnp.cos(jnp.arange(out.size)).reshape(out.shape))

        def f_dual(xaf, xbf, *wargs):
            out = conv3_relu_flat_dual(h, w, xaf, xbf, *wargs)
            return jnp.sum(out * jnp.cos(jnp.arange(out.size)).reshape(out.shape))

        wargs = (ws[0], bs[0], ws[1], bs[1], ws[2], bs[2])
        from jax.experimental.pallas import tpu as pltpu

        with pltpu.force_tpu_interpret_mode():
            o_cat = conv3_relu_flat(h, w, catf, *wargs)
            o_dual = conv3_relu_flat_dual(h, w, xaf, xbf, *wargs)
            np.testing.assert_allclose(o_dual, o_cat, rtol=1e-5, atol=1e-6)
            g_cat = jax.grad(f_cat, argnums=tuple(range(8)))(xaf, xbf, *wargs)
            g_dual = jax.grad(f_dual, argnums=tuple(range(8)))(xaf, xbf, *wargs)
        for name, a, r in zip(
            ["dxa", "dxb", "dw1", "db1", "dw2", "db2", "dw3", "db3"],
            g_dual, g_cat,
        ):
            rel = float(jnp.abs(a - r).max() / (jnp.abs(r).max() + 1e-9))
            assert rel < 2e-5, (name, rel)

    @pytest.mark.parametrize(
        "hw,cu,cs,c", [((8, 8), 8, 4, 4), ((8, 16), 4, 2, 8)]
    )
    def test_flat_packed_dec_matches_concat(self, hw, cu, cs, c):
        """The triple-input packed decoder kernel (upsample even/odd streams
        + packed skip, concat in VMEM with dec_perm-permuted weights) must
        equal the packed kernel on the packed concat — forward and every
        gradient."""
        from jax.experimental.pallas import tpu as pltpu

        from pda.models import flat_ops
        from pda.models.blocks import (
            conv3_relu_flat_packed,
            conv3_relu_flat_packed_dec,
        )

        h, w = hw
        H, W = 2 * h, 2 * w
        rng = np.random.default_rng(31)
        x = jnp.asarray(rng.normal(size=(2, h, w, cu)).astype(np.float32))
        skip = jnp.asarray(rng.normal(size=(2, H, W, cs)).astype(np.float32))
        cin = cu + cs
        ws, bs = [], []
        for (i, o) in [(cin, c), (c, c), (c, c)]:
            ws.append(jnp.asarray(
                rng.normal(size=(3, 3, i, o)).astype(np.float32)) * 0.2)
            bs.append(jnp.asarray(
                rng.normal(size=(o,)).astype(np.float32)) * 0.1)
        wargs = (ws[0], bs[0], ws[1], bs[1], ws[2], bs[2])
        xf = flat_ops.to_flat(x)
        skpf = flat_ops.to_flat_packed(skip)

        def f_ref(xf, skpf, *wargs):
            upf = flat_ops.upsample_flat_to_packed(xf, h, w)
            cat = flat_ops.concat_packed_pair(upf, skpf, cu, cs)
            return conv3_relu_flat_packed(H, W, False, cat, *wargs)

        def f_dec(xf, skpf, *wargs):
            ue, uo = flat_ops.upsample_flat_packed_parts(xf, h, w)
            return conv3_relu_flat_packed_dec(H, W, ue, uo, skpf, *wargs)

        def loss(f):
            def g(*a):
                out = f(*a)
                return jnp.sum(
                    out * jnp.cos(jnp.arange(out.size)).reshape(out.shape)
                )
            return g

        with pltpu.force_tpu_interpret_mode():
            o_ref = f_ref(xf, skpf, *wargs)
            o_dec = f_dec(xf, skpf, *wargs)
            np.testing.assert_allclose(o_dec, o_ref, rtol=1e-4, atol=1e-5)
            g_ref = jax.grad(loss(f_ref), argnums=tuple(range(8)))(
                xf, skpf, *wargs)
            g_dec = jax.grad(loss(f_dec), argnums=tuple(range(8)))(
                xf, skpf, *wargs)
        for name, a, r in zip(
            ["dx", "dskip", "dw1", "db1", "dw2", "db2", "dw3", "db3"],
            g_dec, g_ref,
        ):
            rel = float(jnp.abs(a - r).max() / (jnp.abs(r).max() + 1e-9))
            assert rel < 2e-5, (name, rel)

    @pytest.mark.parametrize(
        "shape,c,rt", [((2, 32, 32, 1), 8, 16), ((1, 16, 48, 4), 8, 8)]
    )
    def test_flat_forward_packed(self, shape, c, rt):
        from pda.kernels.conv_block_packed import (
            conv_block_packed_flat, packed_wpp, uncanvas_packed,
        )
        from pda.kernels.conv_block_packed_bwd import flat_m0 as flat_m0p
        from pda.models.blocks import conv3_relu

        x, ws, bs, _ = self._mk(shape, c, 27)
        b, h, w, cin = shape
        ref = conv3_relu(x, ws[0], bs[0], ws[1], bs[1], ws[2], bs[2])
        xf = flat_m0p(x, packed_wpp(w))
        outf = conv_block_packed_flat(
            xf, h, w, ws[0], bs[0], ws[1], bs[1], ws[2], bs[2],
            row_tile=rt, interpret=True,
        )
        np.testing.assert_allclose(
            uncanvas_packed(outf, h, w), ref, rtol=1e-4, atol=1e-5
        )

    @pytest.mark.parametrize(
        "shape,c,rt", [((2, 32, 32, 1), 8, 16), ((1, 16, 48, 4), 8, 8)]
    )
    def test_flat_backward_packed(self, shape, c, rt):
        from pda.kernels.conv_block_packed import packed_wpp, uncanvas_packed
        from pda.kernels.conv_block_packed_bwd import (
            conv_block_packed_bwd_flat, flat_m0 as flat_m0p,
        )
        from pda.models.blocks import _conv_same

        x, ws, bs, g = self._mk(shape, c, 29)
        b, h, w, cin = shape

        def block(x, w1, b1, w2, b2, w3, b3):
            hh = x
            for wk, bk in ((w1, b1), (w2, b2), (w3, b3)):
                hh = jnp.maximum(_conv_same(hh, wk) + bk, 0.0)
            return hh

        h3, vjp = jax.vjp(block, x, ws[0], bs[0], ws[1], bs[1], ws[2], bs[2])
        ref = vjp(g)
        h1 = jnp.maximum(_conv_same(x, ws[0]) + bs[0], 0.0)
        h2 = jnp.maximum(_conv_same(h1, ws[1]) + bs[1], 0.0)
        wpp = packed_wpp(w)
        out = conv_block_packed_bwd_flat(
            flat_m0p(x, wpp), flat_m0p(h3, wpp), flat_m0p(g, wpp),
            flat_m0p(h1, wpp), flat_m0p(h2, wpp),
            h, w, ws[0], ws[1], ws[2],
            row_tile=rt, interpret=True,
        )
        outs = (uncanvas_packed(out[0], h, w),) + out[1:]
        for name, a, r in zip(
            ["dx", "dw1", "db1", "dw2", "db2", "dw3", "db3"], outs, ref
        ):
            rel = float(jnp.abs(a - r).max() / (jnp.abs(r).max() + 1e-9))
            assert rel < 2e-5, (name, rel)

    @pytest.mark.parametrize(
        "shape,c,rt", [((2, 32, 32, 1), 8, 16), ((1, 16, 48, 2), 8, 8)]
    )
    def test_flat_backward_packed_recompute(self, shape, c, rt):
        """Byte-lean input-block backward: h1/h2 recomputed in-kernel from
        the x band, no dx chain. Weight/bias grads must match autodiff."""
        from pda.kernels.conv_block_packed import packed_wpp
        from pda.kernels.conv_block_packed_bwd import (
            conv_block_packed_bwd_flat, flat_m0 as flat_m0p,
        )
        from pda.models.blocks import _conv_same

        x, ws, bs, g = self._mk(shape, c, 31)
        b, h, w, cin = shape

        def block(x, w1, b1, w2, b2, w3, b3):
            hh = x
            for wk, bk in ((w1, b1), (w2, b2), (w3, b3)):
                hh = jnp.maximum(_conv_same(hh, wk) + bk, 0.0)
            return hh

        h3, vjp = jax.vjp(block, x, ws[0], bs[0], ws[1], bs[1], ws[2], bs[2])
        ref = vjp(g)
        wpp = packed_wpp(w)
        out = conv_block_packed_bwd_flat(
            flat_m0p(x, wpp), flat_m0p(h3, wpp), flat_m0p(g, wpp),
            None, None,
            h, w, ws[0], ws[1], ws[2], b1=bs[0], b2=bs[1],
            row_tile=rt, interpret=True, need_dx=False, recompute=True,
        )
        assert out[0] is None
        for name, a, r in zip(
            ["dw1", "db1", "dw2", "db2", "dw3", "db3"], out[1:], ref[1:]
        ):
            rel = float(jnp.abs(a - r).max() / (jnp.abs(r).max() + 1e-9))
            assert rel < 2e-5, (name, rel)

    @pytest.mark.parametrize(
        "shape,c,rt,g_mode",
        [
            ((2, 32, 32, 4), 8, 8, "pooled"),
            ((1, 64, 32, 2), 8, 16, "pooled"),
            ((2, 32, 32, 4), 8, 8, "both"),
            ((1, 64, 64, 1), 8, 8, "both"),
        ],
    )
    def test_flat_backward_packed_pooled(self, shape, c, rt, g_mode):
        """The in-kernel 2x2 avg-pool transpose (gpf cotangent): pooled-only
        consumers (g_mode='pooled') and dual full-res + pooled consumers
        (g_mode='both') must match autodiff through block [+ pool] at
        multi-band, rectangular and edge geometries."""
        from pda.kernels.conv_block import canvas_wp, flat_m0
        from pda.kernels.conv_block_packed import packed_wpp
        from pda.kernels.conv_block_packed_bwd import (
            conv_block_packed_bwd_flat, flat_m0 as flat_m0p,
        )
        from pda.models.blocks import (
            _conv_same, avg_pool_2x2, packed_pool_out_eligible,
        )

        x, ws, bs, g = self._mk(shape, c, 37)
        b, h, w, cin = shape
        assert packed_pool_out_eligible(h, w, cin, c), (shape, c)
        rng = np.random.default_rng(41)
        gp = jnp.asarray(
            rng.normal(size=(b, h // 2, w // 2, c)).astype(np.float32)
        )

        def block(x, w1, b1, w2, b2, w3, b3):
            hh = x
            for wk, bk in ((w1, b1), (w2, b2), (w3, b3)):
                hh = jnp.maximum(_conv_same(hh, wk) + bk, 0.0)
            return hh

        def consumer(*args):
            out = block(*args)
            pooled = avg_pool_2x2(out)
            if g_mode == "pooled":
                return pooled
            return out, pooled

        cot = gp if g_mode == "pooled" else (g, gp)
        h3full, vjp = jax.vjp(
            consumer, x, ws[0], bs[0], ws[1], bs[1], ws[2], bs[2]
        )
        ref = vjp(cot)
        h3 = block(x, ws[0], bs[0], ws[1], bs[1], ws[2], bs[2])
        h1 = jnp.maximum(_conv_same(x, ws[0]) + bs[0], 0.0)
        h2 = jnp.maximum(_conv_same(h1, ws[1]) + bs[1], 0.0)
        wpp = packed_wpp(w)
        wp2 = canvas_wp(w // 2)
        assert wp2 == wpp  # the eligibility contract the kernel relies on
        out = conv_block_packed_bwd_flat(
            flat_m0p(x, wpp), flat_m0p(h3, wpp),
            flat_m0p(g, wpp) if g_mode == "both" else None,
            flat_m0p(h1, wpp), flat_m0p(h2, wpp),
            h, w, ws[0], ws[1], ws[2],
            row_tile=rt, interpret=True,
            gpf=flat_m0(gp, wp2),
        )
        from pda.kernels.conv_block_packed import uncanvas_packed

        outs = (uncanvas_packed(out[0], h, w),) + out[1:]
        for name, a, r in zip(
            ["dx", "dw1", "db1", "dw2", "db2", "dw3", "db3"], outs, ref
        ):
            rel = float(jnp.abs(a - r).max() / (jnp.abs(r).max() + 1e-9))
            assert rel < 2e-5, (name, rel)


class TestBackwardTailCarry:
    """PDA_PALLAS_CARRY_BWD: the gradient-chain tail-carry reproduces the
    non-carry backward kernels exactly (da2/da1/dx carried rows; packed,
    unpacked, dual, dec, image and pooled-cotangent modes)."""

    def _ws(self, cin, c, rng):
        ws = []
        for ci, co in ((cin, c), (c, c), (c, c)):
            ws += [
                jnp.asarray(
                    rng.normal(size=(3, 3, ci, co)).astype(np.float32) * 0.2
                ),
                jnp.asarray(rng.normal(size=(co,)).astype(np.float32) * 0.1),
            ]
        return ws

    @pytest.mark.parametrize("mode", ["full", "pooled", "both"])
    def test_packed_bwd_carry(self, mode):
        from pda.kernels import conv_block_packed as cp
        from pda.kernels import conv_block_packed_bwd as cb
        from pda.kernels.conv_block_packed_bwd import flat_m0

        h, w, cin, c, rt = 64, 64, 4, 8, 16
        rng = np.random.default_rng(11)
        x = jnp.asarray(rng.normal(size=(2, h, w, cin)).astype(np.float32))
        ws = self._ws(cin, c, rng)
        w1, b1, w2, b2, w3, b3 = ws
        wpp = cp.packed_wpp(w)
        xf = flat_m0(x, wpp)
        outf, h1f, h2f = cp.conv_block_packed_flat(
            xf, h, w, *ws, row_tile=rt, interpret=True,
            save_intermediates=True,
        )
        gf = jnp.asarray(rng.normal(size=outf.shape).astype(np.float32))
        gpf = jnp.asarray(
            rng.normal(size=(2, (h // 2) * wpp, c)).astype(np.float32))
        g_ = gf if mode in ("full", "both") else None
        gp_ = gpf if mode in ("pooled", "both") else None

        def run(carry):
            return cb.conv_block_packed_bwd_flat(
                xf, outf, g_, h1f, h2f, h, w, w1, w2, w3, b1=b1, b2=b2,
                row_tile=rt, interpret=True, need_dx=True, gpf=gp_,
                carry=carry,
            )

        for a, b_ in zip(run(False), run(True)):
            if a is not None:
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))

    def test_unpacked_bwd_carry(self):
        from pda.kernels import conv_block as cf
        from pda.kernels import conv_block_bwd as cb

        h, w, cin, c, rt = 64, 48, 4, 8, 16
        rng = np.random.default_rng(12)
        x = jnp.asarray(rng.normal(size=(2, h, w, cin)).astype(np.float32))
        ws = self._ws(cin, c, rng)
        w1, b1, w2, b2, w3, b3 = ws
        wp = cf.canvas_wp(w)
        xf = cf.flat_m0(x, wp)
        outf, h1f, h2f = cf.conv_block_fused_flat(
            xf, h, w, *ws, row_tile=rt, interpret=True,
            save_intermediates=True,
        )
        gf = jnp.asarray(rng.normal(size=outf.shape).astype(np.float32))

        def run(carry):
            return cb.conv_block_bwd_flat(
                xf, outf, gf, h1f, h2f, h, w, w1, b1, w2, b2, w3,
                row_tile=rt, interpret=True, carry=carry,
            )

        for a, b_ in zip(run(False), run(True)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))

    @pytest.mark.heavy
    def test_full_model_grads_with_both_carries(self, monkeypatch):
        """PDA_PALLAS_CARRY=1 + PDA_PALLAS_CARRY_BWD=1 end-to-end: identical
        loss and parameter gradients through the full PUNet step."""
        from jax.experimental.pallas import tpu as pltpu

        from pda.train.steps import _punet_loss

        model, params, x = _setup(hw=64, batch=1)
        segm = (jax.random.normal(jax.random.PRNGKey(3), x.shape) > 0
                ).astype(jnp.float32)
        key = jax.random.PRNGKey(11)
        monkeypatch.setenv("PDA_PALLAS_CONV", "1")

        def run(flag):
            monkeypatch.setenv("PDA_PALLAS_CARRY", flag)
            monkeypatch.setenv("PDA_PALLAS_CARRY_BWD", flag)
            with pltpu.force_tpu_interpret_mode():
                return jax.value_and_grad(
                    lambda p: _punet_loss(model, p, x, segm, key)[0]
                )(params)

        l0, g0 = run("0")
        l1, g1 = run("1")
        assert float(l0) == float(l1)
        for a, b_ in zip(
            jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), rtol=1e-6, atol=1e-6
            )
