"""Model tests: shapes, upsample parity vs torch, MC decode fast-path equality."""

import jax
import jax.numpy as jnp
import numpy as np

from pda.core import DiagGaussian
from pda.models import (
    ProbabilisticUnet,
    PUNetBackbone,
    UNet2d,
    mc_decode_logits,
    mc_predict_probs,
    upsample_2x_align_corners,
)
from pda.models import punet as punet_lib

SMALL_FILTERS = (8, 16, 24, 32)


def small_punet(**kw):
    defaults = dict(
        input_channels=1,
        num_classes=1,
        num_filters=SMALL_FILTERS,
        latent_dim=6,
        no_convs_fcomb=3,
        beta=1.0,
        rl_swap=True,
    )
    defaults.update(kw)
    return ProbabilisticUnet(**defaults)


class TestUpsample:
    def test_matches_torch_align_corners_true(self):
        import torch
        import torch.nn.functional as F

        x = np.random.default_rng(0).normal(size=(2, 7, 5, 3)).astype(np.float32)
        ours = np.array(upsample_2x_align_corners(jnp.array(x)))
        theirs = (
            F.interpolate(
                torch.from_numpy(x).permute(0, 3, 1, 2),
                scale_factor=2,
                mode="bilinear",
                align_corners=True,
            )
            .permute(0, 2, 3, 1)
            .numpy()
        )
        np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)


class TestPUNetBackbone:
    def test_feature_output_shape(self):
        model = PUNetBackbone(num_filters=SMALL_FILTERS)
        x = jnp.zeros((2, 64, 64, 1))
        params = model.init(jax.random.PRNGKey(0), x)
        out = model.apply(params, x)
        assert out.shape == (2, 64, 64, SMALL_FILTERS[0])

    def test_with_head(self):
        model = PUNetBackbone(num_filters=SMALL_FILTERS, num_classes=2)
        x = jnp.zeros((1, 32, 32, 1))
        params = model.init(jax.random.PRNGKey(0), x)
        assert model.apply(params, x).shape == (1, 32, 32, 2)


class TestUNet2d:
    def test_output_shape_and_sigmoid_range(self):
        model = UNet2d(depth=2, initial_features=4)
        x = jnp.ones((1, 32, 32, 1))
        params = model.init(jax.random.PRNGKey(0), x)
        out = model.apply(params, x)
        assert out.shape == (1, 32, 32, 1)
        assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0


class TestProbabilisticUnet:
    def _init(self, key=0, hw=32, batch=2):
        model = small_punet()
        x = jnp.zeros((batch, hw, hw, 1))
        y = jnp.zeros((batch, hw, hw, 1))
        variables = model.init(jax.random.PRNGKey(key), x, y)
        return model, variables["params"], x, y

    def test_encode_shapes(self):
        model, params, x, y = self._init()
        enc = punet_lib.encode(model, params, x, y)
        assert enc.features.shape == (2, 32, 32, SMALL_FILTERS[0])
        assert enc.prior.mu.shape == (2, 6)
        assert enc.prior.log_sigma.shape == (2, 6)
        assert enc.posterior.mu.shape == (2, 6)

    def test_encode_without_segm_has_no_posterior(self):
        model, params, x, _ = self._init()
        enc = punet_lib.encode(model, params, x)
        assert enc.posterior is None

    def test_decode_shape(self):
        model, params, x, y = self._init()
        enc = punet_lib.encode(model, params, x, y)
        z = enc.prior.sample(jax.random.PRNGKey(1))
        logits = punet_lib.decode(model, params, enc.features, z)
        assert logits.shape == (2, 32, 32, 1)

    def test_mc_fast_path_equals_naive_decode(self):
        # The split feature-term decode must be numerically identical to the
        # plain concat-style decode for each sample.
        model, params, x, y = self._init()
        enc = punet_lib.encode(model, params, x, y)
        key = jax.random.PRNGKey(2)
        logits_mc = mc_decode_logits(model, params, enc.features, enc.prior, key, 4)
        zs = enc.prior.sample_n(key, 4)
        for i in range(4):
            naive = punet_lib.decode(model, params, enc.features, zs[i])
            np.testing.assert_allclose(logits_mc[i], naive, rtol=1e-5, atol=1e-5)

    def test_mc_predict_probs_range_and_shape(self):
        model, params, x, _ = self._init()
        probs = mc_predict_probs(model, params, x, jax.random.PRNGKey(3), 8)
        assert probs.shape == (2, 32, 32, 1)
        assert float(probs.min()) >= 0.0 and float(probs.max()) <= 1.0

    def test_samples_are_diverse(self):
        # The latent space must actually produce diverse segmentations.
        model, params, x, y = self._init()
        x = jax.random.normal(jax.random.PRNGKey(9), x.shape)
        enc = punet_lib.encode(model, params, x, None)
        logits = mc_decode_logits(
            model, params, enc.features, enc.prior, jax.random.PRNGKey(4), 8
        )
        sample_var = jnp.var(logits, axis=0).mean()
        assert float(sample_var) > 0.0

    def test_param_groups_for_l2_reg(self):
        # Reference regularizes posterior + prior + fcomb-minus-last-layer
        # (punet_trainer.py:32-34). Check those groups exist by name.
        model, params, _, _ = self._init()
        assert "prior" in params and "posterior" in params and "fcomb" in params
        assert "last_layer" in params["fcomb"]
        assert "feat_proj" in params["fcomb"]

    def test_jit_encode_decode_roundtrip(self):
        model, params, x, y = self._init()

        @jax.jit
        def step(params, x, y, key):
            enc = model.apply({"params": params}, x, y, method="encode")
            z = enc.posterior.sample(key)
            return model.apply({"params": params}, enc.features, z, method="decode")

        out = step(params, x, y, jax.random.PRNGKey(0))
        assert out.shape == (2, 32, 32, 1)
        assert bool(jnp.all(jnp.isfinite(out)))


class TestFcombMidOrdering:
    def test_mid_keys_numeric_order(self):
        from pda.models.punet import _mid_keys

        fake = {f"mid_{i}": None for i in range(12)}
        fake["z_proj"] = None
        keys = _mid_keys(fake)
        assert keys == [f"mid_{i}" for i in range(12)]
