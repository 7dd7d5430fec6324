"""Train state pytree + parameter-subset regularizer.

The state carries everything the reference's checkpoint does
(model_state, optimizer state, iteration counter, optional teacher_state —
SURVEY.md section 5.4) plus the explicit RNG key JAX needs.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import struct

from ..core.regularization import l2_regularisation


class TrainState(struct.PyTreeNode):
    """Pytree of everything that evolves during training."""

    step: jax.Array
    params: Any
    opt_state: Any
    rng: jax.Array
    # EMA teacher for MeanTeacher/AdaMT self-training; None elsewhere
    # (reference mean_teacher_trainer.py:39-42 deepcopies the model).
    teacher_params: Optional[Any] = None

    def replace_lr(self, new_lr: float) -> "TrainState":
        """Set the injected learning rate (ReduceLROnPlateau host hook).

        Requires an ``optax.inject_hyperparams``-wrapped optimizer (what
        :func:`pda.train.optim.adam` builds); raises a clear error otherwise
        instead of an AttributeError deep inside a train run."""
        opt_state = self.opt_state
        if not hasattr(opt_state, "hyperparams"):
            raise TypeError(
                "replace_lr needs an optax.inject_hyperparams-wrapped "
                "optimizer (use pda.train.optim.adam, or wrap your own); "
                f"got opt_state {type(opt_state).__name__} without "
                ".hyperparams — LR scheduling cannot mutate this optimizer"
            )
        hyperparams = dict(opt_state.hyperparams)
        hyperparams["learning_rate"] = jnp.asarray(
            new_lr, dtype=jnp.asarray(hyperparams["learning_rate"]).dtype
        )
        return self.replace(opt_state=opt_state._replace(hyperparams=hyperparams))

    @property
    def learning_rate(self) -> Optional[float]:
        """The injected learning rate, or None for optimizers that don't
        expose one (plain optax transforms without inject_hyperparams)."""
        hp = getattr(self.opt_state, "hyperparams", None)
        if hp is None or "learning_rate" not in hp:
            return None
        return float(hp["learning_rate"])


def create_train_state(
    params,
    tx,
    key: jax.Array,
    *,
    with_teacher: bool = False,
    teacher_params=None,
) -> TrainState:
    """Fresh state; the teacher (if any) starts as a copy of the student
    (reference mean_teacher_trainer.py:39-42) unless given explicitly."""
    if with_teacher and teacher_params is None:
        # A real buffer copy — aliasing the student's arrays would make the
        # donated train step try to donate the same buffer twice.
        teacher_params = jax.tree_util.tree_map(
            lambda x: jnp.array(x, copy=True), params
        )
    return TrainState(
        step=jnp.asarray(0, dtype=jnp.int32),
        params=params,
        opt_state=tx.init(params),
        rng=key,
        teacher_params=teacher_params if with_teacher else None,
    )


def punet_l2_reg(params) -> jax.Array:
    """l2(posterior) + l2(prior) + l2(fcomb minus last_layer).

    The exact parameter subset every reference trainer regularizes
    (punet_trainer.py:32-34: posterior, prior, fcomb.layers — where
    ``fcomb.layers`` excludes ``fcomb.last_layer``).
    """
    fcomb_body = {k: v for k, v in params["fcomb"].items() if k != "last_layer"}
    return (
        l2_regularisation(params["posterior"])
        + l2_regularisation(params["prior"])
        + l2_regularisation(fcomb_body)
    )
