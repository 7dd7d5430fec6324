"""Golden regression tests: deterministic-seed outputs of the pure math core.

SURVEY.md section 4 point 3 — these values pin the loss/consensus semantics
across refactors and rounds. They were produced by this implementation at
round 1 after the semantics were verified against hand computations and torch
cross-checks (tests/test_core.py); any change to them is a semantics change
and must be deliberate.
"""

import jax
import jax.numpy as jnp
import numpy as np

from pda.core import (
    DiagGaussian,
    consensus_from_logits,
    dice_loss_with_logits,
    kl_divergence,
    neg_elbo,
)


def _fixed_inputs():
    key = jax.random.PRNGKey(1234)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    logits = 3.0 * jax.random.normal(k1, (2, 8, 8, 1))
    segm = (jax.random.uniform(k2, (2, 8, 8, 1)) > 0.5).astype(jnp.float32)
    q = DiagGaussian(
        jax.random.normal(k3, (2, 6)), 0.1 * jax.random.normal(k4, (2, 6))
    )
    p = DiagGaussian(jnp.zeros((2, 6)), jnp.zeros((2, 6)))
    return logits, segm, q, p


class TestGolden:
    def test_kl_value(self):
        _, _, q, p = _fixed_inputs()
        np.testing.assert_allclose(
            float(jnp.mean(kl_divergence(q, p))), 3.332925, rtol=1e-4
        )

    def test_dice_loss_value(self):
        logits, segm, _, _ = _fixed_inputs()
        np.testing.assert_allclose(
            float(dice_loss_with_logits(logits, segm)), 0.370499, rtol=1e-4
        )

    def test_neg_elbo_bce_value(self):
        logits, segm, q, p = _fixed_inputs()
        out, _ = neg_elbo(logits, segm, q, p, beta=1.0, rl_swap=False)
        np.testing.assert_allclose(float(out), 156.90182, rtol=1e-4)

    def test_neg_elbo_dice_with_consensus_value(self):
        logits, segm, q, p = _fixed_inputs()
        consm = (jax.nn.sigmoid(logits) > 0.3).astype(jnp.float32)
        out, _ = neg_elbo(
            logits, segm, q, p, beta=1.0, rl_swap=True,
            consensus_mask=consm, consensus_masking=True,
        )
        np.testing.assert_allclose(float(out), 3.674229, rtol=1e-4)

    def test_consensus_values(self):
        logits, _, _, _ = _fixed_inputs()
        stack = jnp.stack([logits, -logits, 2 * logits, logits + 1.0])
        pseudo, cons = consensus_from_logits(stack)
        np.testing.assert_allclose(float(pseudo.mean()), 0.533796, rtol=1e-4)
        np.testing.assert_allclose(float(cons.mean()), 0.53125, rtol=1e-4)
