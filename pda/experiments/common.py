"""Shared experiment config: augmentation recipes, model configs, naming.

The reference hard-codes these per script; this module centralizes them with
citations so the 17 experiment CLIs stay thin. Checkpoint names reproduce the
reference's exactly (they define the on-disk contract between --train,
--predict and --evaluate phases). The reference's naming bug
``args.masking is True and args.masking is True`` (livecell_mt.py:89 — the
first conjunct should test consensus) is NOT reproduced: masking takes
precedence over weighting, which matches the intent and the trainer wiring.
"""

from __future__ import annotations

import argparse
import os

from ..data.transforms import (
    AdditiveGaussianNoise,
    Compose,
    GaussianBlur,
    RandomApply,
    RandomContrast,
    standardize,
)
from ..models import ProbabilisticUnet


def weak_augmentations(p: float = 0.25):
    """Weak augs: standardize + p-gated {blur, noise(0-0.15)}
    (reference LIVECell/livecell_mt.py:16-26, MitoEM/common.py:51-58,
    Lung-XRay/lung_mt.py:16-26).

    When the native host library is available (pda.data.native, built from
    native/pda_native.cpp) the whole recipe runs as ONE GIL-releasing C call
    per sample so the thread-pool loader scales across cores and keeps the
    chips fed (SURVEY.md section 7 "Two-view CPU augmentation throughput");
    the numpy Compose below is the reference implementation and fallback.
    Set PDA_NATIVE_AUGS=0 to force the numpy path.
    """
    from ..data import native

    if os.environ.get("PDA_NATIVE_AUGS", "1") != "0" and native.available():
        return native.NativeWeakAugmentation(p=p)
    return Compose(
        standardize,
        RandomApply([GaussianBlur()], p=p),
        RandomApply([AdditiveGaussianNoise(scale=(0, 0.15), clip_kwargs=False)], p=p),
    )


def fm_strong_augmentations(p: float = 0.9):
    """FixMatch strong augs: blur sigma 1-4, noise 0.1-0.35, contrast 0.33-3,
    each p-gated at 0.9 (reference LIVECell/livecell_fm.py:56-67)."""
    return Compose(
        standardize,
        RandomApply([GaussianBlur(sigma=(1.0, 4.0))], p=p),
        RandomApply([AdditiveGaussianNoise(scale=(0.1, 0.35), clip_kwargs=False)], p=p),
        RandomApply([RandomContrast(alpha=(0.33, 3), mean=0.0, clip_kwargs=False)], p=p),
    )


def adamatch_strong_augmentations(p: float = 0.5):
    """AdaMatch strong augs: blur 0.6-3 (p), noise 0.05-0.25 (p/2),
    contrast 0.33-3 (p) (reference LIVECell/livecell_adamatch.py:29-40,
    MitoEM/common.py:60-68)."""
    return Compose(
        standardize,
        RandomApply([GaussianBlur(sigma=(0.6, 3.0))], p=p),
        RandomApply(
            [AdditiveGaussianNoise(scale=(0.05, 0.25), clip_kwargs=False)], p=p / 2
        ),
        RandomApply(
            [RandomContrast(mean=0.0, alpha=(0.33, 3.0), clip_kwargs=False)], p=p
        ),
    )


# MitoEM uses the AdaMatch recipe as its strong augs (MitoEM/common.py:60-68).
mitoem_strong_augmentations = adamatch_strong_augmentations


def livecell_punet(consensus_masking: bool = False, dtype=None) -> ProbabilisticUnet:
    """The flagship PUNet config every LIVECell/MitoEM script instantiates
    (reference LIVECell/livecell_punet.py:47-56)."""
    kwargs = {} if dtype is None else {"dtype": dtype}
    return ProbabilisticUnet(
        input_channels=1,
        num_classes=1,
        num_filters=(64, 128, 256, 512),
        latent_dim=6,
        no_convs_fcomb=3,
        beta=1.0,
        rl_swap=True,
        consensus_masking=consensus_masking,
        **kwargs,
    )


# MitoEM uses the same architecture/loss config as LIVECell.
mitoem_punet = livecell_punet


def lung_punet(consensus_masking: bool = False, dtype=None) -> ProbabilisticUnet:
    """Lung PUNet: identical but BCE reconstruction (``rl_swap=False``,
    reference Lung-XRay/lung_punet.py:55-63)."""
    kwargs = {} if dtype is None else {"dtype": dtype}
    return ProbabilisticUnet(
        input_channels=1,
        num_classes=1,
        num_filters=(64, 128, 256, 512),
        latent_dim=6,
        no_convs_fcomb=3,
        beta=1.0,
        rl_swap=False,
        consensus_masking=consensus_masking,
        **kwargs,
    )


def da_name(
    method: str, suite: str, src: str, trg: str, consensus: bool, masking: bool
) -> str:
    """Domain-adaptation checkpoint name, e.g.
    ``mean-teacher-livecell-source-A172-target-BT474-consensus-weighting``
    (reference livecell_mt.py:87-92 et al.)."""
    base = f"{method}-{suite}-source-{src}-target-{trg}"
    if masking:
        return base + "-consensus-masking"
    if consensus:
        return base + "-consensus-weighting"
    return base


def standard_parser(description: str, extra_flags=()) -> argparse.ArgumentParser:
    """The reference's common CLI surface: --train/--predict/--evaluate
    (+ --consensus/--masking where relevant), --data, --pred_path,
    --source_checkpoints, --save_root (reference livecell_mt.py:199-222)."""
    parser = argparse.ArgumentParser(description=description)
    parser.add_argument("--train", action="store_true")
    parser.add_argument("--predict", action="store_true")
    parser.add_argument("--evaluate", action="store_true")
    if "consensus" in extra_flags:
        parser.add_argument("--consensus", action="store_true",
                            help="Consensus weighting of the ELBO")
        parser.add_argument("--masking", action="store_true",
                            help="Consensus masking (binarized) of the ELBO")
    if "pseudo" in extra_flags:
        parser.add_argument("--get_pseudo_labels", action="store_true")
    if "type" in extra_flags:
        parser.add_argument(
            "--type", type=str, default=None,
            help="Whether to run on a particular type of data domain.",
        )
    parser.add_argument("--data", type=str, default="./data/")
    parser.add_argument("--pred_path", type=str, default="./predictions/")
    parser.add_argument("--source_checkpoints", type=str, default="checkpoints/")
    parser.add_argument("--save_root", type=str, default=None)
    parser.add_argument("--iterations", type=int, default=None,
                        help="Override the default iteration budget")
    parser.add_argument("--mesh", type=str, default=None,
                        help="Device mesh (additive over the reference CLI): "
                             "'auto' (all devices data-parallel), 'data=N', "
                             "or 'data=N,space=M' (M-way image-row sharding)")
    return parser


def mesh_from_arg(args):
    """Build the device mesh requested by ``--mesh`` (or the ``PDA_MESH``
    env var for the thin reference-mirroring CLIs). None -> single device.

    Specs: ``auto`` = all local devices on the ``data`` axis; ``data=N``;
    ``data=N,space=M`` = 2-D mesh that also shards image rows (see
    pda/parallel/mesh.py).
    """
    spec = getattr(args, "mesh", None) or os.environ.get("PDA_MESH")
    if not spec:
        return None
    import jax

    from ..parallel import get_mesh, get_mesh_2d

    if spec == "auto":
        return get_mesh(len(jax.devices()))
    axes = {}
    for token in spec.split(","):
        key, eq, value = token.partition("=")
        if not eq or key in axes or not value.isdigit() or int(value) < 1:
            raise ValueError(
                f"bad --mesh spec {spec!r}: expected "
                "'auto', 'data=N', or 'data=N,space=M' (N, M >= 1)"
            )
        axes[key] = int(value)
    n_data = axes.pop("data", 1)
    n_space = axes.pop("space", 1)
    if axes:
        raise ValueError(f"unknown mesh axes in --mesh: {sorted(axes)}")
    if n_space > 1:
        return get_mesh_2d(n_data, n_space)
    return get_mesh(n_data)


def lung_data_path(root_input_dir: str, domain: str) -> str:
    """Per-domain lung data dir (reference Lung-XRay/lung_punet.py:14-49)."""
    sub = {
        "jsrt1": "jsrt1/",
        "jsrt2": "jsrt2/",
        "nih": "nih_processed/",
        "montgomery": "montgomery_processed/",
    }[domain]
    import os

    return os.path.join(root_input_dir, sub)
