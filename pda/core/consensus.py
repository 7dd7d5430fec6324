"""Monte-Carlo pseudo-labels + consensus response — pure, jittable.

The central self-training primitive of the framework: given a stack of MC
segmentation samples, produce the soft pseudo-label (mean probability) and the
per-pixel consensus response (mean agreement with a confident band), optionally
binarized to a mask.

Reference semantics (prob_utils/my_trainer/mean_teacher_trainer.py:72-88,
prob_utils/my_predictions/punet_predictions.py:104-124):
  samples    = sigmoid(logits_s),  s = 1..n
  agree_s    = (samples_s >= upper) | (samples_s <= lower)
  pseudo     = mean_s samples_s
  consensus  = mean_s agree_s
  if masking: consensus = (consensus == 1)        # unanimous agreement only

The reference runs this as a 16-iteration Python loop of full forwards; here it
is a single fused reduction over a leading sample axis — the whole MC-16 +
consensus compiles into one XLA program (see also pda.kernels.mc_consensus for
the Pallas-fused variant).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

UPPER_THRESHOLD = 0.9
LOWER_THRESHOLD = 0.1


def consensus_from_probs(
    sample_probs: jax.Array,
    *,
    upper: float = UPPER_THRESHOLD,
    lower: float = LOWER_THRESHOLD,
    masking: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """(pseudo_label, consensus) from a stack of sample probabilities.

    sample_probs: (n_samples, ...) in [0, 1].
    Returns arrays of shape (...,).
    """
    pseudo = jnp.mean(sample_probs, axis=0)
    agree = jnp.logical_or(sample_probs >= upper, sample_probs <= lower)
    consensus = jnp.mean(agree.astype(sample_probs.dtype), axis=0)
    if masking:
        consensus = (consensus == 1.0).astype(sample_probs.dtype)
    return pseudo, consensus


def consensus_from_logits(
    sample_logits: jax.Array,
    *,
    upper: float = UPPER_THRESHOLD,
    lower: float = LOWER_THRESHOLD,
    masking: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Same as :func:`consensus_from_probs` but fusing in the sigmoid.

    The threshold comparison is done in logit space
    (p >= u  <=>  logit >= log(u/(1-u))), saving a sigmoid materialization of
    the (n_samples, B, H, W, C) stack on the hot path.
    """
    pseudo = jnp.mean(jax.nn.sigmoid(sample_logits), axis=0)
    logit_upper = jnp.log(upper / (1.0 - upper))
    logit_lower = jnp.log(lower / (1.0 - lower))
    agree = jnp.logical_or(sample_logits >= logit_upper, sample_logits <= logit_lower)
    consensus = jnp.mean(agree.astype(pseudo.dtype), axis=0)
    if masking:
        consensus = (consensus == 1.0).astype(pseudo.dtype)
    return pseudo, consensus


def distribution_alignment(
    pseudo: jax.Array,
    source_distribution: jax.Array,
    *,
    eps: float = 0.0,
    axis_name: str = None,
) -> Tuple[jax.Array, jax.Array]:
    """FixMatch distribution alignment, jittable re-statement.

    Reference (prob_utils/my_trainer/fixmatch_trainer.py:77-84) computes the
    binary class frequency of the pseudo-labels with a data-dependent
    ``torch.unique`` and rescales:
        ratio = source_dist / target_dist
        y     = where(y < .5, y*ratio[bg], y*ratio[fg]).clip(0, 1)
    ``torch.unique(return_counts=True)`` on a {0,1} tensor is just a fixed
    2-bin histogram, i.e. the foreground mean — re-expressed here with static
    shapes so it stays inside jit (SURVEY.md section 7 "Hard parts").

    Returns (aligned_pseudo, distribution_ratio[bg, fg]).
    """
    fg = jnp.mean((pseudo >= 0.5).astype(pseudo.dtype))
    if axis_name is not None:  # class frequency of the GLOBAL batch
        fg = jax.lax.pmean(fg, axis_name)
    target_distribution = jnp.stack([1.0 - fg, fg])
    ratio = source_distribution / (target_distribution + eps)
    aligned = jnp.where(pseudo < 0.5, pseudo * ratio[0], pseudo * ratio[1])
    return jnp.clip(aligned, 0.0, 1.0), ratio
