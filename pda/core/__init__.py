"""Pure jittable math core: distributions, losses, consensus, metrics, EMA."""

from .consensus import (
    LOWER_THRESHOLD,
    UPPER_THRESHOLD,
    consensus_from_logits,
    consensus_from_probs,
    distribution_alignment,
)
from .distributions import DiagGaussian, kl_divergence, mc_kl_divergence
from .ema import ema_update, ramped_momentum
from .losses import (
    bce_with_logits,
    dice_loss,
    dice_loss_with_logits,
    neg_elbo,
)
from .metrics import dice_score, dice_score_jnp
from .regularization import l2_regularisation

__all__ = [
    "DiagGaussian",
    "kl_divergence",
    "mc_kl_divergence",
    "bce_with_logits",
    "dice_loss",
    "dice_loss_with_logits",
    "neg_elbo",
    "consensus_from_probs",
    "consensus_from_logits",
    "distribution_alignment",
    "UPPER_THRESHOLD",
    "LOWER_THRESHOLD",
    "dice_score",
    "dice_score_jnp",
    "ema_update",
    "ramped_momentum",
    "l2_regularisation",
]
