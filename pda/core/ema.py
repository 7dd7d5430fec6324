"""Exponential-moving-average teacher updates — pure tree ops.

Replaces the reference's per-parameter Python loops
(prob_utils/my_trainer/mean_teacher_trainer.py:52-55,
prob_utils/my_trainer/adamt_trainer.py:40-43) with a single tree_map that
compiles into the jitted train step (no separate host pass over parameters).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ema_update(teacher_params, student_params, momentum) -> object:
    """teacher <- momentum * teacher + (1 - momentum) * student.

    ``momentum`` may be a python float or a traced scalar (for the ramped
    schedule). Matches mean_teacher_trainer.py:52-55.
    """
    return jax.tree_util.tree_map(
        lambda t, s: t * momentum + s * (1.0 - momentum),
        teacher_params,
        student_params,
    )


def ramped_momentum(step: jax.Array, momentum: float = 0.999) -> jax.Array:
    """AdaMT ramped momentum: min(1 - 1/(step + 1), momentum).

    Matches adamt_trainer.py:40-43 — early iterations copy the student almost
    directly; the schedule saturates at ``momentum``.
    """
    return jnp.minimum(1.0 - 1.0 / (step + 1.0), momentum)
