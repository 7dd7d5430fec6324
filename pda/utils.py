"""Small shared utilities (reference prob_utils/my_utils + my_models/utils).

Most of the reference's utils live in pda.core (dice_score) and
pda.data.transforms (standardize); this module holds the remaining odds and
ends for API familiarity.
"""

from __future__ import annotations

import os

from .core.metrics import dice_score  # noqa: F401  (re-export)
from .data.transforms import standardize as my_standardize  # noqa: F401

#: exact reference name (prob_utils/my_utils/util.py:9-14) — numpy arrays
#: here, not torch tensors; same (x - mean) / (std + eps) semantics
my_standardize_torch = my_standardize


class DummyLoss:
    """Placeholder loss object (reference prob_utils/my_utils/util.py:5-6).

    The reference needs it because torch_em's DefaultTrainer requires
    loss/metric arguments even when the trainer computes its loss internally.
    pda trainers don't require it, but it is accepted anywhere a loss kwarg
    exists so reference-style call sites keep working.
    """

    def __call__(self, *args, **kwargs):  # pragma: no cover - never used
        raise RuntimeError("DummyLoss is a placeholder and must not be called")


def clean_folder(folder_path: str) -> None:
    """Remove all files in a folder (reference my_models/utils.py:51-55) —
    used to avoid experimental overlap in pseudo-label export dirs."""
    if not os.path.isdir(folder_path):
        return
    for filename in os.listdir(folder_path):
        myfile = os.path.join(folder_path, filename)
        if os.path.isfile(myfile):
            os.remove(myfile)
