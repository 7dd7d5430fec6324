"""TB image-panel fidelity: every trainer writes its reference logger's
panel set of IN-GRAPH tensors (pseudo-labels, consensus masks, MC sample
grids, predictions) at ``log_image_interval`` train steps AND on every
validation — the reference's human-in-the-loop QC for self-training
(punet_trainer.py:100-125, mean_teacher_trainer.py:194-230,
fixmatch_trainer.py:163-212, adamt_trainer.py:192-228,
adamatch_trainer.py:172-207, punet_target_trainer.py:70-89).

The TensorBoard writer is replaced by a recorder so the assertions run on
what would be written, without parsing event files.
"""

import numpy as np
import pytest

from pda.data import (
    Compose,
    DualImageCollectionDataset,
    ImageCollectionDataset,
    Loader,
)
from pda.data.synthetic import make_consensus_arrays, make_dataset_arrays
from pda.data.transforms import AdditiveGaussianNoise, standardize
from pda.models import ProbabilisticUnet, UNet2d
from pda.train import (
    AdaMatchTrainer,
    AdaMTTrainer,
    FixMatchTrainer,
    MeanTeacherTrainer,
    PseudoTrainer,
    PseudoTrainerPUNet,
    PUNetTrainer,
    UNetTrainer,
)

pytestmark = pytest.mark.slow  # fit()-heavy suite; default run skips, use --runslow

FILTERS = (4, 8, 12, 16)
PATCH = (32, 32)


class _RecorderTB:
    """Stands in for tensorboardX.SummaryWriter; records every call."""

    def __init__(self):
        self.images = []  # (full_tag, np image, step)
        self.scalars = []

    def add_scalar(self, tag, value, step=None, **kw):
        self.scalars.append((tag, float(value), step))

    def add_image(self, tag, img_tensor, step=None, **kw):
        self.images.append((tag, np.asarray(img_tensor), step))

    def close(self):
        pass


def _punet(**kw):
    return ProbabilisticUnet(
        num_filters=FILTERS, latent_dim=6, no_convs_fcomb=3, beta=1.0,
        rl_swap=True, **kw,
    )


def _sup_loaders():
    raws, labels = make_dataset_arrays(4, (64, 64))
    ds = ImageCollectionDataset(raws, labels, patch_shape=PATCH)
    return Loader(ds, 2, seed=0), Loader(ds, 1, seed=1)


def _pseudo_loaders():
    raws, labels = make_dataset_arrays(4, (64, 64))
    cons = make_consensus_arrays(labels)
    ds = ImageCollectionDataset(raws, labels, cons, patch_shape=PATCH)
    return Loader(ds, 2, seed=0), Loader(ds, 1, seed=1)


def _dual_loaders():
    raws, labels = make_dataset_arrays(4, (64, 64))
    aug = Compose(standardize, AdditiveGaussianNoise(scale=(0.0, 0.15)))
    ds = DualImageCollectionDataset(
        raws, labels, patch_shape=PATCH, augmentation1=aug, augmentation2=aug
    )
    return Loader(ds, 2, seed=0), Loader(ds, 1, seed=1)


def _drive(trainer, iterations=2):
    """fit() with the recorder patched in; panels log at step 0 (interval 100
    never hits again within 2 steps) and on the epoch-end validation."""
    rec = _RecorderTB()
    trainer.logger.tb = rec
    trainer.fit(iterations)
    return rec


def _assert_panels(rec, tags, grid_tags=()):
    """The written panel tag set EQUALS the expected set, under both train/
    (interval step 0) and validation/ — so a panel-key rename desyncing the
    trainers' documented ``image_tags`` fails here; panel images are finite
    and 2-D-with-channel shaped."""
    for prefix in ("train", "validation"):
        written = {tag.split("/", 1)[1] for tag, _, _ in rec.images
                   if tag.startswith(prefix + "/")}
        assert written == set(tags), (prefix, sorted(written), sorted(tags))
    for tag, img, _ in rec.images:
        assert np.all(np.isfinite(img)), tag
        base = tag.split("/", 1)[1]
        if base in grid_tags:  # grids are larger than a single patch
            assert img.shape[-1] > PATCH[1] and img.shape[-2] > PATCH[0], (
                tag, img.shape)


class TestPanelSets:
    def test_punet_trainer_panels(self, tmp_path):
        train, val = _sup_loaders()
        t = PUNetTrainer("log-punet", _punet(), train, val,
                         learning_rate=1e-3, save_root=str(tmp_path))
        rec = _drive(t)
        _assert_panels(rec, t.image_tags, grid_tags=("samples",))
        # the sample panel is a 4x4 grid of 16 prior samples
        grids = [img for tag, img, _ in rec.images if tag.endswith("/samples")]
        assert grids and grids[0].shape[-1] >= 4 * PATCH[1]

    def test_unet_trainer_panels(self, tmp_path):
        train, val = _sup_loaders()
        model = UNet2d(in_channels=1, out_channels=1, initial_features=4,
                       final_activation="Sigmoid")
        t = UNetTrainer("log-unet", model, train, val,
                        learning_rate=1e-3, save_root=str(tmp_path))
        rec = _drive(t)
        _assert_panels(rec, ("input", "target", "prediction"))

    def test_pseudo_unet_panels(self, tmp_path):
        train, val = _pseudo_loaders()
        model = UNet2d(in_channels=1, out_channels=1, initial_features=4,
                       final_activation="Sigmoid")
        t = PseudoTrainer("log-pseudo-unet", model, train, val,
                          learning_rate=1e-3, save_root=str(tmp_path))
        rec = _drive(t)
        _assert_panels(rec, ("input", "target", "prediction"))

    def test_pseudo_punet_panels(self, tmp_path):
        train, val = _pseudo_loaders()
        t = PseudoTrainerPUNet(
            "log-pseudo-punet", _punet(consensus_masking=True), train, val,
            learning_rate=1e-3, save_root=str(tmp_path))
        rec = _drive(t)
        _assert_panels(rec, ("input", "target", "samples"),
                       grid_tags=("samples",))

    def test_mean_teacher_panels(self, tmp_path):
        train, val = _dual_loaders()
        t = MeanTeacherTrainer(
            "log-mt", _punet(consensus_masking=True), train, val,
            learning_rate=1e-3, save_root=str(tmp_path),
            do_consensus_masking=True)
        rec = _drive(t)
        _assert_panels(rec, t.image_tags)
        # teacher consensus is a {0,1} mask; pseudo labels live in [0,1]
        for tag, img, _ in rec.images:
            if tag.endswith("/teacher_consensus"):
                assert set(np.unique(img)).issubset({0.0, 1.0})
            if tag.endswith(("/teacher_predictions", "/model_samples")):
                assert img.min() >= 0.0 and img.max() <= 1.0

    def test_fixmatch_panels(self, tmp_path):
        train, val = _dual_loaders()
        t = FixMatchTrainer(
            "log-fm", _punet(consensus_masking=True), train, val,
            learning_rate=1e-3, save_root=str(tmp_path),
            do_consensus_masking=True)
        rec = _drive(t)
        # the single reference grid panel (fixmatch_trainer.py:193-196)
        _assert_panels(rec, ("weak-strong-labels-pred",),
                       grid_tags=("weak-strong-labels-pred",))

    def test_adamt_panels(self, tmp_path):
        strain, _ = _sup_loaders()
        ttrain, tval = _dual_loaders()
        t = AdaMTTrainer(
            "log-adamt", _punet(consensus_masking=True), strain, ttrain,
            tval, learning_rate=1e-3, save_root=str(tmp_path))
        rec = _drive(t)
        _assert_panels(rec, t.image_tags)

    def test_adamatch_panels(self, tmp_path):
        strain, _ = _sup_loaders()
        ttrain, tval = _dual_loaders()
        t = AdaMatchTrainer(
            "log-adamatch", _punet(consensus_masking=True), strain, ttrain,
            tval, learning_rate=1e-3, save_root=str(tmp_path))
        rec = _drive(t)
        _assert_panels(rec, t.image_tags)

    def test_interval_cadence(self, tmp_path):
        """Panels only at interval steps: interval=2 over 4 steps -> train
        panels at steps 0 and 2 only (plus the validation set)."""
        train, val = _sup_loaders()
        t = PUNetTrainer("log-cadence", _punet(), train, val,
                         learning_rate=1e-3, save_root=str(tmp_path),
                         log_image_interval=2)
        rec = _drive(t, iterations=4)
        train_steps = sorted({step for tag, _, step in rec.images
                              if tag.startswith("train/")})
        assert train_steps == [0, 2]
