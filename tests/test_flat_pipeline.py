"""Flat activation pipeline: flat-layout ops and the end-to-end flat model
path must match the image-layout path (pda/models/flat_ops.py).

Kernels run in Pallas interpreter mode on CPU (pltpu.force_tpu_interpret_mode)
with the Pallas path force-enabled, exactly like the kernel tests.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # multi-minute suite; default run skips, use --runslow
from jax.experimental.pallas import tpu as pltpu

from pda.models import ProbabilisticUnet
from pda.models import flat_ops
from pda.models.blocks import avg_pool_2x2, upsample_2x_align_corners
from pda.models.unet import PUNetBackbone

FILTERS = (4, 8, 12, 16)


def _img(shape, seed=0):
    return jax.random.normal(jax.random.PRNGKey(seed), shape, jnp.float32)


class TestFlatOps:
    @pytest.mark.parametrize("shape", [(2, 32, 32, 4), (1, 16, 48, 8)])
    def test_pool_flat(self, shape):
        x = _img(shape)
        ref = avg_pool_2x2(x)
        out = flat_ops.pool_flat(flat_ops.to_flat(x), shape[1], shape[2])
        got = flat_ops.from_flat(out, shape[1] // 2, shape[2] // 2)
        np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)

    @pytest.mark.parametrize("shape", [(2, 32, 32, 4), (1, 16, 48, 3)])
    def test_pool_flat_packed(self, shape):
        x = _img(shape)
        ref = avg_pool_2x2(x)
        out = flat_ops.pool_flat_packed(
            flat_ops.to_flat_packed(x), shape[1], shape[2]
        )
        got = flat_ops.from_flat(out, shape[1] // 2, shape[2] // 2)
        np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)

    @pytest.mark.parametrize("shape", [(2, 16, 16, 4), (1, 8, 24, 8)])
    def test_upsample_flat(self, shape):
        x = _img(shape)
        ref = upsample_2x_align_corners(x)
        out = flat_ops.upsample_flat(flat_ops.to_flat(x), shape[1], shape[2])
        got = flat_ops.from_flat(out, 2 * shape[1], 2 * shape[2])
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)

    @pytest.mark.parametrize("shape", [(2, 16, 16, 4), (1, 8, 24, 8)])
    def test_upsample_flat_to_packed(self, shape):
        x = _img(shape)
        ref = upsample_2x_align_corners(x)
        out = flat_ops.upsample_flat_to_packed(
            flat_ops.to_flat(x), shape[1], shape[2]
        )
        got = flat_ops.from_flat_packed(out, 2 * shape[1], 2 * shape[2])
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)

    def test_concat_packed_pair(self):
        a, b = _img((2, 8, 8, 4), 1), _img((2, 8, 8, 6), 2)
        ref = flat_ops.to_flat_packed(jnp.concatenate([a, b], axis=-1))
        got = flat_ops.concat_packed_pair(
            flat_ops.to_flat_packed(a), flat_ops.to_flat_packed(b), 4, 6
        )
        np.testing.assert_allclose(got, ref)

    def test_mean_flat(self):
        x = _img((2, 16, 24, 8))
        ref = jnp.mean(x, axis=(1, 2))
        np.testing.assert_allclose(
            flat_ops.mean_flat(flat_ops.to_flat(x), 16, 24), ref,
            rtol=1e-5, atol=1e-6,
        )
        np.testing.assert_allclose(
            flat_ops.mean_flat_packed(flat_ops.to_flat_packed(x), 16, 24, 8),
            ref, rtol=1e-5, atol=1e-6,
        )

    def test_plan_flagship_geometry(self):
        plan = flat_ops.flat_pipeline_plan(
            64, 64, 1, FILTERS, with_decoder=True
        )
        assert plan is not None and plan["l0_packed"] and plan["dec_packed"]
        # too shallow rows at the last level => no plan
        assert (
            flat_ops.flat_pipeline_plan(32, 32, 1, FILTERS, with_decoder=True)
            is None
        )


class TestFlatModelPath:
    """The full flat pipeline must reproduce the image-layout model."""

    def _model(self):
        return ProbabilisticUnet(
            num_filters=FILTERS, no_convs_fcomb=3, beta=1.0, rl_swap=True
        )

    def test_backbone_flat_matches_image(self, monkeypatch):
        x = _img((2, 64, 64, 1))
        bb = PUNetBackbone(num_filters=FILTERS)
        params = bb.init(jax.random.PRNGKey(0), x)["params"]

        monkeypatch.setenv("PDA_PALLAS_CONV", "0")
        ref = bb.apply({"params": params}, x)
        monkeypatch.setenv("PDA_PALLAS_CONV", "1")
        with pltpu.force_tpu_interpret_mode():
            out = bb.apply({"params": params}, x)
        assert out.shape == ref.shape
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)

    def test_encode_flat_matches_image(self, monkeypatch):
        x = _img((2, 64, 64, 1))
        segm = (_img((2, 64, 64, 1), 3) > 0).astype(jnp.float32)
        model = self._model()
        params = model.init(jax.random.PRNGKey(0), x, segm)["params"]

        monkeypatch.setenv("PDA_PALLAS_CONV", "0")
        ref = model.apply({"params": params}, x, segm, method="encode")
        monkeypatch.setenv("PDA_PALLAS_CONV", "1")
        with pltpu.force_tpu_interpret_mode():
            enc = model.apply({"params": params}, x, segm, method="encode")
        np.testing.assert_allclose(
            enc.features, ref.features, rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(enc.prior.mu, ref.prior.mu, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(
            enc.posterior.log_sigma, ref.posterior.log_sigma, rtol=1e-4, atol=1e-4
        )

    @pytest.mark.heavy
    def test_loss_grads_flat_match_image(self, monkeypatch):
        from pda.train.steps import _punet_loss

        x = _img((1, 64, 64, 1))
        segm = (_img((1, 64, 64, 1), 3) > 0).astype(jnp.float32)
        model = self._model()
        params = model.init(jax.random.PRNGKey(0), x, segm)["params"]
        key = jax.random.PRNGKey(11)

        def loss(p):
            return _punet_loss(model, p, x, segm, key)[0]

        monkeypatch.setenv("PDA_PALLAS_CONV", "0")
        ref_l, ref_g = jax.value_and_grad(loss)(params)
        monkeypatch.setenv("PDA_PALLAS_CONV", "1")
        with pltpu.force_tpu_interpret_mode():
            out_l, out_g = jax.value_and_grad(loss)(params)
        np.testing.assert_allclose(out_l, ref_l, rtol=1e-4)
        flat_r = jax.tree_util.tree_leaves_with_path(ref_g)
        flat_o = dict(
            (jax.tree_util.keystr(k), v)
            for k, v in jax.tree_util.tree_leaves_with_path(out_g)
        )
        for k, r in flat_r:
            a = flat_o[jax.tree_util.keystr(k)]
            rel = float(jnp.abs(a - r).max() / (jnp.abs(r).max() + 1e-9))
            assert rel < 5e-4, (jax.tree_util.keystr(k), rel)

    def test_mc_pseudo_flat_matches_image(self, monkeypatch):
        """Teacher MC pseudo-labels through the flat BACKBONE (the tail runs
        the image-layout decode — the production default; see
        IMPLEMENTATION_STATUS "measured dead ends") match the pure image
        path."""
        from pda.train.steps import _mc_pseudo

        x = _img((2, 64, 64, 1))
        model = self._model()
        params = model.init(
            jax.random.PRNGKey(0), x, jnp.zeros_like(x)
        )["params"]
        key = jax.random.PRNGKey(7)

        monkeypatch.setenv("PDA_PALLAS_MC", "0")
        monkeypatch.setenv("PDA_PALLAS_CONV", "0")
        ref_y, ref_z = _mc_pseudo(model, params, x, key, 4, True)
        monkeypatch.setenv("PDA_PALLAS_CONV", "1")
        with pltpu.force_tpu_interpret_mode():
            out_y, out_z = _mc_pseudo(model, params, x, key, 4, True)
        np.testing.assert_allclose(out_y, ref_y, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(out_z, ref_z, rtol=1e-4, atol=1e-5)


    def test_mc_decode_logits_flat_tail_matches_image(self, monkeypatch):
        """The flat Fcomb MC tail (mc_decode_logits feat_geom branch:
        block-diagonal packed kernels, 1-channel logits boundary) is
        numerically identical to the image tail. Opt-in path (measured
        slower at the hot geometry) but part of the public decode API."""
        from pda.models.punet import mc_decode_logits

        x = _img((2, 64, 64, 1))
        model = self._model()
        params = model.init(
            jax.random.PRNGKey(0), x, jnp.zeros_like(x)
        )["params"]
        key = jax.random.PRNGKey(5)

        monkeypatch.setenv("PDA_PALLAS_CONV", "0")
        enc = model.apply({"params": params}, x, method="encode")
        ref = mc_decode_logits(model, params, enc.features, enc.prior, key, 4)
        monkeypatch.setenv("PDA_PALLAS_CONV", "1")
        with pltpu.force_tpu_interpret_mode():
            encf = model.apply(
                {"params": params}, x, flat_features=True, method="encode"
            )
            assert encf.feat_geom is not None
            out = mc_decode_logits(
                model, params, encf.features, encf.prior, key, 4,
                feat_geom=encf.feat_geom,
            )
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


class TestPoolMatmulForm:
    def test_pool_mm_matches_reduce_form(self, monkeypatch):
        """The matmul-formulated column pool (PDA_POOL_MM, default on) is
        numerically identical to the reshape-sum + pad form, for both the
        unpacked and packed flats, values and gradients."""
        import jax
        import jax.numpy as jnp

        from pda.models import flat_ops

        rng = np.random.default_rng(0)
        h, w, c = 32, 48, 8
        x = jnp.asarray(rng.normal(size=(2, h, w, c)).astype(np.float32))
        xf = flat_ops.to_flat(x)
        xfp = flat_ops.to_flat_packed(x)

        def run(flag):
            monkeypatch.setenv("PDA_POOL_MM", flag)
            f = lambda a: jnp.sum(flat_ops.pool_flat(a, h, w) ** 2)  # noqa: E731
            fp = lambda a: jnp.sum(  # noqa: E731
                flat_ops.pool_flat_packed(a, h, w) ** 2
            )
            return (
                np.asarray(flat_ops.pool_flat(xf, h, w)),
                np.asarray(flat_ops.pool_flat_packed(xfp, h, w)),
                np.asarray(jax.grad(f)(xf)),
                np.asarray(jax.grad(fp)(xfp)),
            )

        a = run("0")
        b = run("1")
        for u, v in zip(a, b):
            np.testing.assert_allclose(u, v, atol=1e-5)
