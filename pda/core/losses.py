"""Segmentation losses and the PUNet ELBO — pure, jittable.

TPU-native re-statement of the loss semantics in
reference: prob_utils/my_models/probabilistic_unet.py:341-371 and the
torch_em Dice losses the reference delegates to
(reference call sites: probabilistic_unet.py:8,347).

Reduction semantics preserved exactly (they matter for Dice parity, see
SURVEY.md section 7 "Hard parts"):
  * BCE recon loss: elementwise, then summed over ALL axes.
  * Dice-with-logits recon loss (``rl_swap=True``): channelwise dice over
    (batch + spatial), ``1 - dice`` summed over channels.
  * KL: mean over batch.
  * neg_elbo = recon_sum + beta * kl_mean.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .distributions import DiagGaussian, kl_divergence, mc_kl_divergence


def _axes(axis_name) -> Optional[tuple]:
    """Normalize an axis spec (None | str | tuple of str) to a tuple or None.
    Tuples arise on 2-D (data, space) shard_map meshes where pixel-level
    sums must cross BOTH the batch shards and the row shards."""
    if axis_name is None:
        return None
    return (axis_name,) if isinstance(axis_name, str) else tuple(axis_name)


def _gsum(x: jax.Array, axis_name) -> jax.Array:
    """Cross-shard sum whose VALUE is global but whose GRADIENT is local.

    With batches sharded over ``axis_name``, every ``sum over the batch``
    below becomes ``stop_gradient(psum(x)) + (x - stop_gradient(x))``:
    the forward value is exactly the global-batch sum (so nonlinear
    reductions like the dice ratio see the same operands as the
    single-device program), while reverse AD sees only the local ``x`` —
    no collective is ever differentiated. Each shard's gradient is then
    exactly d(global loss)/d(params via THIS shard's data), and the plain
    ``psum`` over gradients in ``steps._apply_updates`` reassembles the
    single-device gradient bit-for-bit (up to float reassociation).

    Differentiating through the collective instead is a trap: under
    ``shard_map(check_vma=False)`` (required — the Pallas kernels cannot
    satisfy vma inference, jax 0.9) the transpose of ``psum`` is ``psum``,
    which silently scales gradients by the shard count.
    """
    axes = _axes(axis_name)
    if axes is None:
        return x
    return jax.lax.stop_gradient(jax.lax.psum(x, axes)) + (
        x - jax.lax.stop_gradient(x)
    )


def _gmean(x: jax.Array, axis_name) -> jax.Array:
    """Global-batch mean (equal shard sizes assumed, which shard_map's even
    partitioning guarantees). Same value-global/gradient-local construction
    as :func:`_gsum`: the local term carries 1/n of the gradient, matching
    d(global mean)/d(local element) = 1/(n * local_count)."""
    m = jnp.mean(x)
    axes = _axes(axis_name)
    if axes is None:
        return m
    n = 1
    for a in axes:
        n *= jax.lax.axis_size(a)
    return jax.lax.stop_gradient(jax.lax.pmean(m, axes)) + (
        m - jax.lax.stop_gradient(m)
    ) / n


def bce_with_logits(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """Elementwise binary cross entropy with logits (no reduction).

    Numerically stable form of torch ``nn.BCEWithLogitsLoss(reduction=None)``
    (reference: probabilistic_unet.py:348).
    """
    # max(x, 0) - x*t + log(1 + exp(-|x|))
    return (
        jnp.maximum(logits, 0.0)
        - logits * targets
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def dice_loss_with_logits(
    logits: jax.Array,
    targets: jax.Array,
    eps: float = 1e-7,
    axis_name: Optional[str] = None,
) -> jax.Array:
    """Channelwise soft-dice loss on sigmoided logits, summed over channels.

    Equivalent of torch_em ``DiceLossWithLogits`` (used by the reference when
    ``rl_swap=True``, probabilistic_unet.py:347): per channel c,
    ``1 - 2*sum(p*t) / max(sum(p^2) + sum(t^2), eps)`` with the sums running
    over batch and spatial axes, then summed over channels. Layout here is
    NHWC (channel-last, TPU-native) vs the reference's NCHW. ``axis_name``:
    inside shard_map the batch sums psum across shards BEFORE the ratio, so
    the sharded loss equals the global-batch loss exactly.
    """
    probs = jax.nn.sigmoid(logits)
    reduce_axes = tuple(range(logits.ndim - 1))  # all but channel
    num = _gsum(2.0 * jnp.sum(probs * targets, axis=reduce_axes), axis_name)
    denom = _gsum(
        jnp.sum(jnp.square(probs), axis=reduce_axes)
        + jnp.sum(jnp.square(targets), axis=reduce_axes),
        axis_name,
    )
    score = num / jnp.clip(denom, min=eps)
    return jnp.sum(1.0 - score)


def dice_loss(
    pred: jax.Array,
    targets: jax.Array,
    eps: float = 1e-7,
    axis_name: Optional[str] = None,
) -> jax.Array:
    """Channelwise soft-dice loss on probabilities (torch_em ``DiceLoss``).

    Used for plain-UNet supervised / pseudo training where the model output is
    already sigmoided (reference: LIVECell/livecell_unet.py:48 via
    default_segmentation_trainer; LIVECell/livecell_punet_target.py:105-106).
    """
    reduce_axes = tuple(range(pred.ndim - 1))
    num = _gsum(2.0 * jnp.sum(pred * targets, axis=reduce_axes), axis_name)
    denom = _gsum(
        jnp.sum(jnp.square(pred), axis=reduce_axes)
        + jnp.sum(jnp.square(targets), axis=reduce_axes),
        axis_name,
    )
    score = num / jnp.clip(denom, min=eps)
    return jnp.sum(1.0 - score)


def neg_elbo(
    reconstruction_logits: jax.Array,
    segm: jax.Array,
    posterior: DiagGaussian,
    prior: DiagGaussian,
    *,
    beta: float = 1.0,
    rl_swap: bool = True,
    consensus_mask: Optional[jax.Array] = None,
    consensus_masking: bool = False,
    analytic_kl: bool = True,
    z_posterior: Optional[jax.Array] = None,
    axis_name: Optional[str] = None,
    space_axis: Optional[str] = None,
):
    """Negative evidence lower bound, exactly as the reference computes it.

    reference: probabilistic_unet.py:341-371 —
      criterion = DiceLossWithLogits if rl_swap else BCEWithLogits(unreduced)
      kl        = mean over batch of KL(posterior || prior): analytic, or the
                  single-sample MC estimate log q(z) - log p(z) evaluated at
                  the SAME posterior draw used for the reconstruction when
                  ``analytic_kl=False`` (probabilistic_unet.py:324-339,352-354)
      recon     = sum(criterion(recon [* consm], segm [* consm]))
      elbo      = -(recon + beta * kl)   (this function returns -elbo)

    Note the reference multiplies the consensus mask into the *logits* (not the
    probabilities) before the criterion (probabilistic_unet.py:363-366); we
    preserve that.

    Returns (neg_elbo, aux) where aux carries the recon/kl pieces for logging.
    """
    # Per-image reductions (KL mean over the batch) cross only the BATCH
    # shards — row shards hold identical per-image stats (the encoders'
    # pooled mean is already space-global), so including the space axis
    # would double-divide the gradient. Pixel-level sums (recon) cross both.
    recon_axes = (_axes(axis_name) or ()) + (_axes(space_axis) or ())
    recon_axes = recon_axes or None
    if analytic_kl:
        kl = _gmean(kl_divergence(posterior, prior), axis_name)
    else:
        if z_posterior is None:
            raise ValueError("analytic_kl=False requires the posterior draw "
                             "z_posterior that produced the reconstruction")
        kl = _gmean(mc_kl_divergence(posterior, prior, z_posterior), axis_name)

    if consensus_masking and consensus_mask is not None:
        rec_in = reconstruction_logits * consensus_mask
        seg_in = segm * consensus_mask
    else:
        rec_in = reconstruction_logits
        seg_in = segm

    if rl_swap:
        recon = dice_loss_with_logits(rec_in, seg_in, axis_name=recon_axes)
    else:
        recon = _gsum(jnp.sum(bce_with_logits(rec_in, seg_in)), recon_axes)

    kl_term = kl
    if space_axis is not None:
        # The KL is computed REDUNDANTLY on every row shard (its pooled
        # Gaussian stats are space-global); the outer gradient psum over
        # the space axis would count it n_space times, so the objective
        # carries gradient kl' / n_space while the VALUE stays kl (the
        # same stop_gradient construction as _gsum). Pairs with the real
        # differentiated pmean in blocks.global_mean_rows_sharded.
        ns = 1
        for a in _axes(space_axis):
            ns *= jax.lax.axis_size(a)
        kl_term = jax.lax.stop_gradient(kl) + (
            kl - jax.lax.stop_gradient(kl)
        ) / ns

    out = recon + beta * kl_term
    return out, {"recon_loss": recon, "kl": kl}
