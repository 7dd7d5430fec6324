"""Pallas kernel tests (interpreter mode on CPU): fused MC consensus must
match the XLA vmap path exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

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
    def test_matches_xla_path(self, masking):
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
                n_samples=n, masking=masking, row_tile=256,
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
