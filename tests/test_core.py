"""Unit tests for pda.core — the pure math the whole framework rests on.

Covers the SURVEY.md section 4 minimum bar: analytic-vs-MC KL, ELBO reduction
semantics, consensus algebra, EMA schedules, distribution alignment, dice
thresholds. Where a torch twin exists (BCE), we cross-check against torch CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pda.core import (
    DiagGaussian,
    bce_with_logits,
    consensus_from_logits,
    consensus_from_probs,
    dice_loss_with_logits,
    dice_score,
    dice_score_jnp,
    distribution_alignment,
    ema_update,
    kl_divergence,
    l2_regularisation,
    mc_kl_divergence,
    neg_elbo,
    ramped_momentum,
)


class TestDiagGaussian:
    def test_kl_same_dist_is_zero(self):
        d = DiagGaussian(jnp.array([[0.3, -1.0]]), jnp.array([[0.1, -0.5]]))
        assert jnp.allclose(kl_divergence(d, d), 0.0, atol=1e-6)

    def test_kl_hand_computed(self):
        # KL(N(1, e^0) || N(0, e^0)) per-dim = 0.5 * mu^2 = 0.5; two dims -> 1.0
        q = DiagGaussian(jnp.array([[1.0, 1.0]]), jnp.zeros((1, 2)))
        p = DiagGaussian(jnp.zeros((1, 2)), jnp.zeros((1, 2)))
        assert jnp.allclose(kl_divergence(q, p), 1.0, atol=1e-6)

    def test_analytic_kl_matches_mc_estimate(self):
        # SURVEY.md section 4.1: analytic KL vs MC KL estimate.
        key = jax.random.PRNGKey(0)
        q = DiagGaussian(jnp.array([[0.5, -0.2, 0.1]]), jnp.array([[-0.3, 0.2, 0.0]]))
        p = DiagGaussian(jnp.array([[0.0, 0.1, -0.1]]), jnp.array([[0.0, -0.1, 0.3]]))
        zs = q.sample_n(key, 200_000)  # (n, 1, 3)
        mc = jnp.mean(jax.vmap(lambda z: mc_kl_divergence(q, p, z))(zs))
        assert jnp.allclose(mc, kl_divergence(q, p)[0], atol=2e-2)

    def test_sample_statistics(self):
        key = jax.random.PRNGKey(1)
        d = DiagGaussian(jnp.full((1, 4), 2.0), jnp.full((1, 4), jnp.log(0.5)))
        zs = d.sample_n(key, 100_000)
        assert jnp.allclose(zs.mean(), 2.0, atol=1e-2)
        assert jnp.allclose(zs.std(), 0.5, atol=1e-2)

    def test_log_prob_matches_scipy(self):
        from scipy.stats import norm

        d = DiagGaussian(jnp.array([[0.5, -1.0]]), jnp.array([[0.2, -0.3]]))
        z = jnp.array([[0.1, 0.4]])
        expected = norm.logpdf(
            np.array(z), loc=np.array(d.mu), scale=np.exp(np.array(d.log_sigma))
        ).sum()
        assert jnp.allclose(d.log_prob(z)[0], expected, atol=1e-5)


class TestLosses:
    def test_bce_matches_torch(self):
        import torch

        logits = np.random.default_rng(0).normal(size=(2, 8, 8, 1)).astype(np.float32)
        targets = (np.random.default_rng(1).random((2, 8, 8, 1)) > 0.5).astype(np.float32)
        ours = np.array(bce_with_logits(jnp.array(logits), jnp.array(targets)))
        theirs = torch.nn.functional.binary_cross_entropy_with_logits(
            torch.from_numpy(logits), torch.from_numpy(targets), reduction="none"
        ).numpy()
        np.testing.assert_allclose(ours, theirs, rtol=5e-4, atol=1e-5)

    def test_dice_loss_with_logits_perfect_prediction(self):
        # Confident correct logits -> loss near 0.
        targets = jnp.zeros((1, 8, 8, 1)).at[0, 2:6, 2:6, 0].set(1.0)
        logits = jnp.where(targets > 0, 50.0, -50.0)
        assert dice_loss_with_logits(logits, targets) < 1e-4

    def test_dice_loss_with_logits_hand_value(self):
        # p = sigmoid(0) = 0.5 everywhere, target all ones over N pixels:
        # dice = 2*(0.5*N) / (0.25*N + N) = 1/1.25 = 0.8 -> loss 0.2
        n = 16
        logits = jnp.zeros((1, 4, 4, 1))
        targets = jnp.ones((1, 4, 4, 1))
        assert jnp.allclose(dice_loss_with_logits(logits, targets), 0.2, atol=1e-5)

    def test_neg_elbo_reduction_semantics(self):
        # SURVEY.md section 4.1: recon SUMMED, KL MEANED over batch (reference
        # probabilistic_unet.py:351,368-371).
        key = jax.random.PRNGKey(0)
        b, h, w = 4, 8, 8
        logits = jax.random.normal(key, (b, h, w, 1))
        segm = (jax.random.uniform(jax.random.PRNGKey(1), (b, h, w, 1)) > 0.5).astype(
            jnp.float32
        )
        q = DiagGaussian(jnp.ones((b, 3)), jnp.zeros((b, 3)))
        p = DiagGaussian(jnp.zeros((b, 3)), jnp.zeros((b, 3)))
        out, aux = neg_elbo(logits, segm, q, p, beta=2.0, rl_swap=False)
        expected_recon = jnp.sum(bce_with_logits(logits, segm))
        expected_kl = jnp.mean(kl_divergence(q, p))
        assert jnp.allclose(aux["recon_loss"], expected_recon, rtol=1e-6)
        assert jnp.allclose(aux["kl"], expected_kl, rtol=1e-6)
        assert jnp.allclose(out, expected_recon + 2.0 * expected_kl, rtol=1e-6)

    def test_neg_elbo_consensus_masks_logits(self):
        # The reference multiplies the mask into logits AND targets
        # (probabilistic_unet.py:363-366).
        logits = jnp.full((1, 4, 4, 1), 3.0)
        segm = jnp.ones((1, 4, 4, 1))
        consm = jnp.zeros((1, 4, 4, 1))
        q = p = DiagGaussian(jnp.zeros((1, 2)), jnp.zeros((1, 2)))
        masked, _ = neg_elbo(
            logits, segm, q, p, beta=0.0, rl_swap=False,
            consensus_mask=consm, consensus_masking=True,
        )
        # All-zero mask -> BCE(0 logits, 0 targets) = log(2) per pixel, summed.
        assert jnp.allclose(masked, 16 * jnp.log(2.0), rtol=1e-5)

    def test_neg_elbo_mc_kl(self):
        # analytic_kl=False uses the single-sample MC estimate at the SAME
        # posterior draw as the reconstruction (reference
        # probabilistic_unet.py:341-354); in expectation over draws it matches
        # the analytic KL.
        b = 512
        logits = jnp.zeros((b, 2, 2, 1))
        segm = jnp.zeros((b, 2, 2, 1))
        q = DiagGaussian(jnp.full((b, 3), 0.7), jnp.full((b, 3), -0.2))
        p = DiagGaussian(jnp.zeros((b, 3)), jnp.zeros((b, 3)))
        zs = q.sample(jax.random.PRNGKey(0))
        mc, aux = neg_elbo(
            logits, segm, q, p, beta=1.0, rl_swap=False,
            analytic_kl=False, z_posterior=zs,
        )
        analytic, aux_a = neg_elbo(logits, segm, q, p, beta=1.0, rl_swap=False)
        assert jnp.allclose(aux["kl"], aux_a["kl"], atol=0.05)
        with pytest.raises(ValueError):
            neg_elbo(logits, segm, q, p, analytic_kl=False)


class TestConsensus:
    def test_consensus_algebra(self):
        # 4 samples on one pixel: [0.95, 0.95, 0.05, 0.5]
        # agree = [1, 1, 1, 0] -> consensus 0.75 ; pseudo = mean = 0.6125
        probs = jnp.array([0.95, 0.95, 0.05, 0.5]).reshape(4, 1, 1, 1, 1)
        pseudo, cons = consensus_from_probs(probs)
        assert jnp.allclose(pseudo, 0.6125)
        assert jnp.allclose(cons, 0.75)

    def test_consensus_masking_requires_unanimity(self):
        probs = jnp.array([0.95, 0.95, 0.95]).reshape(3, 1, 1)
        _, cons = consensus_from_probs(probs, masking=True)
        assert jnp.allclose(cons, 1.0)
        probs = jnp.array([0.95, 0.95, 0.5]).reshape(3, 1, 1)
        _, cons = consensus_from_probs(probs, masking=True)
        assert jnp.allclose(cons, 0.0)

    def test_logits_path_matches_probs_path(self):
        key = jax.random.PRNGKey(0)
        logits = 4.0 * jax.random.normal(key, (16, 2, 8, 8, 1))
        p_pseudo, p_cons = consensus_from_probs(jax.nn.sigmoid(logits))
        l_pseudo, l_cons = consensus_from_logits(logits)
        np.testing.assert_allclose(p_pseudo, l_pseudo, atol=1e-6)
        np.testing.assert_allclose(p_cons, l_cons, atol=1e-6)

    def test_distribution_alignment(self):
        # Reference fixmatch_trainer.py:77-84 semantics on a hand case.
        pseudo = jnp.array([[0.2, 0.8], [0.1, 0.9]])  # fg fraction = 0.5
        source = jnp.array([0.25, 0.75])
        aligned, ratio = distribution_alignment(pseudo, source)
        np.testing.assert_allclose(ratio, [0.5, 1.5], rtol=1e-6)
        np.testing.assert_allclose(
            aligned, [[0.1, 1.0], [0.05, 1.0]], rtol=1e-6
        )  # clipped at 1


class TestEMA:
    def test_flat_ema(self):
        t = {"w": jnp.ones(3)}
        s = {"w": jnp.zeros(3)}
        out = ema_update(t, s, 0.9)
        np.testing.assert_allclose(out["w"], 0.9)

    def test_ramped_momentum_schedule(self):
        # adamt_trainer.py:40-43: min(1 - 1/(it+1), 0.999)
        assert jnp.allclose(ramped_momentum(jnp.array(0.0)), 0.0)
        assert jnp.allclose(ramped_momentum(jnp.array(1.0)), 0.5)
        assert jnp.allclose(ramped_momentum(jnp.array(10_000.0)), 0.999)


class TestDice:
    def test_dice_soft_and_thresholded(self):
        seg = np.array([[0.9, 0.1], [0.8, 0.2]])
        gt = np.array([[1, 0], [1, 0]])
        soft = dice_score(seg, gt)
        np.testing.assert_allclose(soft, 2 * 1.7 / (2 + 2.0 + 1e-7), rtol=1e-6)
        hard = dice_score(seg, gt, threshold_seg=0.5)
        np.testing.assert_allclose(hard, 1.0, rtol=1e-6)

    def test_dice_jnp_matches_numpy(self):
        rng = np.random.default_rng(3)
        seg = rng.random((32, 32)).astype(np.float32)
        gt = (rng.random((32, 32)) > 0.5).astype(np.float32)
        np.testing.assert_allclose(
            dice_score(seg, gt, threshold_seg=0.5),
            float(dice_score_jnp(jnp.array(seg), jnp.array(gt), threshold_seg=0.5)),
            rtol=1e-5,
        )

    def test_shape_mismatch_raises(self):
        with pytest.raises(AssertionError):
            dice_score(np.zeros((2, 2)), np.zeros((3, 3)))


class TestL2Reg:
    def test_matches_reference_semantics(self):
        # Sum of per-tensor 2-norms, NOT a global norm (my_models/utils.py:32-40).
        params = {"a": jnp.array([3.0, 4.0]), "b": {"c": jnp.array([5.0, 12.0])}}
        assert jnp.allclose(l2_regularisation(params), 5.0 + 13.0)


def test_every_env_knob_is_documented_in_knobs_md():
    """KNOBS.md's contract: every PDA_* environment variable the code reads
    appears in the table (grep check from the doc, enforced)."""
    import re
    from pathlib import Path

    root = Path(__file__).resolve().parents[1]
    used = set()
    for base in ("pda", "native"):
        for p in (root / base).rglob("*"):
            if p.suffix in (".py", ".cpp"):
                used |= set(re.findall(r"PDA_[A-Z0-9_]+", p.read_text()))
    for name in ("bench.py", "__graft_entry__.py"):
        used |= set(re.findall(r"PDA_[A-Z0-9_]+", (root / name).read_text()))
    documented = set(re.findall(r"PDA_[A-Z0-9_]+", (root / "KNOBS.md").read_text()))
    missing = sorted(used - documented)
    assert not missing, f"undocumented env knobs: {missing} — add them to KNOBS.md"
    # names ending in '_' are prose brace-expansions (PDA_PALLAS_{A,B}),
    # not knob rows
    stale = sorted(k for k in documented - used if not k.endswith("_"))
    assert not stale, (
        f"KNOBS.md documents knobs the code no longer reads: {stale} — "
        f"remove the rows (pruned-knob records belong in "
        f"IMPLEMENTATION_STATUS.md)"
    )


class TestShardMapTransposeCanary:
    """FAST version-gate for the shard_map gradient semantics the parallel
    paths are BUILT ON (the heavyweight equality pins live in the slow
    suite; this canary fails in seconds if a JAX upgrade changes the
    check_vma=False legacy transpose rules).

    Contract pinned here (see pda/core/losses._gsum and
    pda/models/blocks.global_mean_rows_sharded):
      * _gsum: value is the global psum, gradient is the LOCAL identity —
        never scaled by the shard count;
      * pmean: transpose is psum(ct)/n — for a replicated consumer each
        shard's cotangent comes back FULL (the cross-shard gather the
        encoders' pooled stats require), not divided per copy;
      * ppermute: transpose is the inverse permutation (boundary shards'
        unpaired sends vanish; receives come back to the sender).
    """

    def _mesh2(self):
        import jax
        from jax.sharding import Mesh

        return Mesh(np.asarray(jax.devices("cpu")[:2]), ("s",))

    def _grad_per_shard(self, body, x):
        import jax
        from jax.sharding import PartitionSpec as P

        g = jax.shard_map(
            jax.grad(body), mesh=self._mesh2(),
            in_specs=P("s"), out_specs=P("s"), check_vma=False,
        )
        return np.asarray(jax.jit(g)(x))

    def test_gsum_gradient_is_local_identity(self):
        import jax.numpy as jnp

        from pda.core.losses import _gsum

        x = np.arange(4.0, dtype=np.float32)
        g = self._grad_per_shard(lambda v: _gsum(jnp.sum(v), "s"), x)
        np.testing.assert_allclose(g, np.ones(4, np.float32))

    def test_pmean_transpose_is_psum_over_n(self):
        import jax
        import jax.numpy as jnp

        x = np.arange(4.0, dtype=np.float32)
        # replicated consumer: every shard computes sum(pmean(local));
        # legacy transpose must hand each shard the FULL summed cotangent/n
        # => d/dx_local = n * (1/n) = 1 per element
        g = self._grad_per_shard(
            lambda v: jnp.sum(jax.lax.pmean(v, "s")), x
        )
        np.testing.assert_allclose(g, np.ones(4, np.float32))

    def test_ppermute_transpose_is_inverse_permutation(self):
        import jax
        import jax.numpy as jnp

        x = np.arange(4.0, dtype=np.float32)
        # shard 0 -> shard 1; only shard 0's elements influence the
        # (shard-1-only) consumer, so its gradient is ones, shard 1's zeros
        def body(v):
            recv = jax.lax.ppermute(v, "s", [(0, 1)])
            return jnp.sum(recv * jax.lax.axis_index("s"))

        g = self._grad_per_shard(body, x)
        np.testing.assert_allclose(g, np.array([1, 1, 0, 0], np.float32))
