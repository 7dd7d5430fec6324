"""Parameter-norm regularization.

Equivalent of reference prob_utils/my_models/utils.py:32-40
(``l2_regularisation``: the SUM of per-tensor 2-norms — not the squared
norm and not a single global norm), applied by every trainer to the
posterior + prior + fcomb-body parameter subsets
(e.g. punet_trainer.py:32-34).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def l2_regularisation(params) -> jax.Array:
    """Sum of the 2-norms of every leaf tensor in the pytree."""
    leaves = jax.tree_util.tree_leaves(params)
    return sum(jnp.linalg.norm(leaf.reshape(-1)) for leaf in leaves)
