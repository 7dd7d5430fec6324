"""Optimizer + LR-plateau scheduling.

The reference uses Adam + torch ReduceLROnPlateau(mode=min, factor=0.9,
patience=10) stepped on the validation metric each epoch
(LIVECell/livecell_punet.py:58-59, torch_em DefaultTrainer). Here the
optimizer is optax Adam with an injected learning rate; the plateau logic is
a tiny host-side controller that rewrites the injected hyperparameter between
jitted steps (no recompilation — the LR is a traced scalar).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import optax


def adam(learning_rate: float) -> optax.GradientTransformation:
    """Adam with an injectable (mutable-between-steps) learning rate."""
    return optax.inject_hyperparams(optax.adam)(learning_rate=learning_rate)


@dataclass
class ReduceLROnPlateau:
    """torch.optim.lr_scheduler.ReduceLROnPlateau(mode='min') twin.

    ``step(metric)`` returns the (possibly reduced) learning rate to install.
    """

    factor: float = 0.9
    patience: int = 10
    min_lr: float = 0.0
    #: relative improvement needed to count as "better" — torch's default
    #: (threshold=1e-4, threshold_mode='rel', mode='min'): metric must drop
    #: below best*(1 - threshold), else the epoch counts as bad. Without it,
    #: infinitesimal noise-level improvements reset patience and the LR
    #: never decays.
    threshold: float = 1e-4
    best: float = field(default=float("inf"), init=False)
    num_bad_epochs: int = field(default=0, init=False)

    def _is_better(self, metric: float) -> bool:
        if self.best == float("inf"):
            return True
        return metric < self.best * (1.0 - self.threshold)

    def step(self, metric: float, current_lr: float) -> float:
        if self._is_better(metric):
            self.best = metric
            self.num_bad_epochs = 0
            return current_lr
        self.num_bad_epochs += 1
        if self.num_bad_epochs > self.patience:
            self.num_bad_epochs = 0
            return max(current_lr * self.factor, self.min_lr)
        return current_lr

    def state_dict(self) -> dict:
        return {"best": self.best, "num_bad_epochs": self.num_bad_epochs}

    def load_state_dict(self, state: dict) -> None:
        self.best = state["best"]
        self.num_bad_epochs = state["num_bad_epochs"]
