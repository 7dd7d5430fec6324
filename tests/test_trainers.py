"""Integration tests: every trainer runs end-to-end on synthetic data.

SURVEY.md section 4 point 2: tiny synthetic dataset -> each trainer runs N
steps with finite loss; checkpoint save/restore round-trip including teacher
state; warm-start flow.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # fit()-heavy suite; default run skips, use --runslow

from pda.data import (
    AdditiveGaussianNoise,
    Compose,
    DualImageCollectionDataset,
    ImageCollectionDataset,
    Loader,
    standardize,
)
from pda.data.synthetic import make_consensus_arrays, make_dataset_arrays
from pda.models import ProbabilisticUnet, UNet2d
from pda.train import (
    AdaMatchTrainer,
    AdaMTTrainer,
    FixMatchTrainer,
    MeanTeacherTrainer,
    PseudoTrainer,
    PseudoTrainerPUNet,
    PUNetTrainer,
    ReduceLROnPlateau,
    UNetTrainer,
)

FILTERS = (4, 8, 12, 16)
PATCH = (32, 32)


def punet():
    return ProbabilisticUnet(
        input_channels=1,
        num_classes=1,
        num_filters=FILTERS,
        latent_dim=6,
        no_convs_fcomb=3,
        beta=1.0,
        rl_swap=True,
    )


def sup_loaders(tmp, n=4, bs=2):
    raws, labels = make_dataset_arrays(n, (64, 64))
    ds = ImageCollectionDataset(raws, labels, patch_shape=PATCH)
    return Loader(ds, bs, seed=0), Loader(ds, 1, seed=1)


def pseudo_loaders(n=4, bs=2):
    raws, labels = make_dataset_arrays(n, (64, 64))
    cons = make_consensus_arrays(labels)
    ds = ImageCollectionDataset(raws, labels, cons, patch_shape=PATCH)
    return Loader(ds, bs, seed=0), Loader(ds, 1, seed=1)


def dual_loaders(n=4, bs=2):
    raws, labels = make_dataset_arrays(n, (64, 64))
    aug = Compose(standardize, AdditiveGaussianNoise(scale=(0.0, 0.15)))
    ds = DualImageCollectionDataset(
        raws, labels, patch_shape=PATCH, augmentation1=aug, augmentation2=aug
    )
    return Loader(ds, bs, seed=0), Loader(ds, 1, seed=1)


def _fit_and_check(trainer, iterations=4):
    stats = trainer.fit(iterations)
    assert stats["iterations"] == iterations
    # loss finite after training
    metrics = trainer.validate()
    assert np.isfinite(metrics["loss"])
    return trainer, metrics


class TestSupervisedTrainers:
    def test_unet_trainer(self, tmp_path):
        train, val = sup_loaders(tmp_path)
        model = UNet2d(depth=2, initial_features=4)
        t = UNetTrainer(
            "test-unet", model, train, val,
            learning_rate=1e-3, save_root=str(tmp_path), logger=False,
        )
        _fit_and_check(t)
        assert os.path.exists(tmp_path / "checkpoints" / "test-unet" / "best.ckpt")
        assert os.path.exists(tmp_path / "checkpoints" / "test-unet" / "latest.ckpt")

    def test_punet_trainer_loss_decreases(self, tmp_path):
        train, val = sup_loaders(tmp_path, n=8)
        t = PUNetTrainer(
            "test-punet", punet(), train, val,
            learning_rate=1e-3, save_root=str(tmp_path), logger=False,
            lr_scheduler=ReduceLROnPlateau(factor=0.9, patience=10),
        )
        t.initialize()
        first_losses, last_losses = [], []
        stats = t.fit(12)
        val_metrics = t.validate()
        assert 0.0 <= val_metrics["dice"] <= 1.0
        assert np.isfinite(val_metrics["loss"])

    def test_checkpoint_roundtrip(self, tmp_path):
        train, val = sup_loaders(tmp_path)
        t = PUNetTrainer(
            "test-ckpt", punet(), train, val,
            learning_rate=1e-3, save_root=str(tmp_path), logger=False,
        )
        t.fit(2)
        step_before = int(t.state.step)
        params_before = jax.tree_util.tree_leaves(t.state.params)[0]

        t2 = PUNetTrainer(
            "test-ckpt", punet(), train, val,
            learning_rate=1e-3, save_root=str(tmp_path), logger=False,
        )
        t2.load_checkpoint("latest")
        assert int(t2.state.step) == step_before
        np.testing.assert_allclose(
            jax.tree_util.tree_leaves(t2.state.params)[0], params_before
        )

    def test_checkpoint_portable_across_meshes(self, tmp_path):
        """A checkpoint written by a mesh-sharded trainer restores on a
        single device and vice versa (checkpoints store host arrays; the
        mesh is a runtime property, not a serialized one)."""
        from pda.parallel import get_mesh, get_mesh_2d

        # batch size must divide the data axis (2, then 8 below)
        raws, labels = make_dataset_arrays(8, (64, 64))
        ds = ImageCollectionDataset(raws, labels, patch_shape=PATCH)
        train, val = Loader(ds, 8, seed=0), Loader(ds, 8, seed=1)
        t = PUNetTrainer(
            "test-mesh-ckpt", punet(), train, val,
            learning_rate=1e-3, save_root=str(tmp_path), logger=False,
            mesh=get_mesh_2d(2, 4),
        )
        t.fit(2)
        params_before = np.asarray(
            jax.tree_util.tree_leaves(t.state.params)[0]
        )

        # mesh-trained ckpt -> single device
        t2 = PUNetTrainer(
            "test-mesh-ckpt", punet(), train, val,
            learning_rate=1e-3, save_root=str(tmp_path), logger=False,
        )
        t2.load_checkpoint("latest")
        assert int(t2.state.step) == 2
        np.testing.assert_allclose(
            np.asarray(jax.tree_util.tree_leaves(t2.state.params)[0]),
            params_before,
        )

        # same ckpt -> a different (1-D data) mesh, and training continues
        t3 = PUNetTrainer(
            "test-mesh-ckpt", punet(), train, val,
            learning_rate=1e-3, save_root=str(tmp_path), logger=False,
            mesh=get_mesh(8),
        )
        t3.fit(4, load_from_checkpoint="latest")
        assert int(t3.state.step) == 4

    def test_checkpoint_meta_embedded_and_legacy(self, tmp_path):
        """Meta rides inside the .ckpt file (single atomic commit unit); the
        .json sidecar is informational only. Legacy sidecar-only checkpoints
        still load."""
        from flax import serialization

        from pda.train.checkpoint import load_checkpoint, save_checkpoint
        from pda.train.state import create_train_state
        from pda.train.optim import adam

        model = punet()
        x0 = jnp.zeros((1, 32, 32, 1))
        params = model.init(jax.random.PRNGKey(0), x0, x0)["params"]
        state = create_train_state(params, adam(1e-3), jax.random.PRNGKey(1))
        d = str(tmp_path / "ckpt")
        save_checkpoint(d, state, which="latest", best_metric=0.25)

        # sidecar deleted -> meta still available from the embedded header
        os.remove(os.path.join(d, "latest.json"))
        _, meta = load_checkpoint(d, state, which="latest")
        assert meta["best_metric"] == 0.25

        # legacy file (raw msgpack, meta only in a sidecar) still loads
        import json as _json

        with open(os.path.join(d, "legacy.ckpt"), "wb") as f:
            f.write(serialization.to_bytes(state))
        with open(os.path.join(d, "legacy.json"), "w") as f:
            _json.dump({"best_metric": 0.5, "step": 0}, f)
        restored, meta = load_checkpoint(d, state, which="legacy")
        assert meta["best_metric"] == 0.5
        np.testing.assert_allclose(
            jax.tree_util.tree_leaves(restored.params)[0],
            jax.tree_util.tree_leaves(state.params)[0],
        )

    def test_latest_checkpoint_records_current_best_metric(self, tmp_path):
        """latest.ckpt must carry THIS epoch's best-metric comparison: a
        resume from latest that restored the pre-comparison value would let
        a later, worse epoch overwrite best.ckpt."""
        import json as _json

        train, val = sup_loaders(tmp_path)
        t = PUNetTrainer(
            "test-bestmeta", punet(), train, val,
            learning_rate=1e-3, save_root=str(tmp_path), logger=False,
        )
        t.fit(2)
        d = str(tmp_path / "checkpoints" / "test-bestmeta")
        with open(os.path.join(d, "latest.json")) as f:
            latest = _json.load(f)
        # first epoch: current metric IS the best metric, and latest must say so
        assert latest["best_metric"] == latest["current_metric"]
        t2 = PUNetTrainer(
            "test-bestmeta", punet(), train, val,
            learning_rate=1e-3, save_root=str(tmp_path), logger=False,
        )
        t2.load_checkpoint("latest")
        assert t2._best_metric == latest["best_metric"]

    def test_resume_continues_iterations(self, tmp_path):
        train, val = sup_loaders(tmp_path)
        t = PUNetTrainer(
            "test-resume", punet(), train, val,
            learning_rate=1e-3, save_root=str(tmp_path), logger=False,
        )
        t.fit(2)
        t2 = PUNetTrainer(
            "test-resume", punet(), train, val,
            learning_rate=1e-3, save_root=str(tmp_path), logger=False,
        )
        t2.fit(4, load_from_checkpoint="latest")
        assert int(t2.state.step) == 4


class TestPseudoTrainers:
    def test_pseudo_unet(self, tmp_path):
        train, val = pseudo_loaders()
        model = UNet2d(depth=2, initial_features=4)
        t = PseudoTrainer(
            "test-pseudo-unet", model, train, val,
            learning_rate=1e-3, save_root=str(tmp_path), logger=False,
        )
        _fit_and_check(t)

    def test_pseudo_punet_consensus_weighting(self, tmp_path):
        train, val = pseudo_loaders()
        model = ProbabilisticUnet(
            num_filters=FILTERS, no_convs_fcomb=3, beta=1.0,
            rl_swap=True, consensus_masking=True,
        )
        t = PseudoTrainerPUNet(
            "test-pseudo-punet", model, train, val,
            learning_rate=1e-3, save_root=str(tmp_path), logger=False,
        )
        _fit_and_check(t)


class TestSelfTrainingTrainers:
    def test_mean_teacher(self, tmp_path):
        train, val = dual_loaders()
        model = ProbabilisticUnet(
            num_filters=FILTERS, no_convs_fcomb=3, beta=1.0,
            rl_swap=True, consensus_masking=True,
        )
        t = MeanTeacherTrainer(
            "test-mt", model, train, val,
            learning_rate=1e-3, save_root=str(tmp_path), logger=False,
            momentum=0.99,
        )
        _fit_and_check(t)
        # teacher must exist, differ from student, and round-trip via ckpt
        assert t.state.teacher_params is not None
        t2 = MeanTeacherTrainer(
            "test-mt", model, train, val,
            learning_rate=1e-3, save_root=str(tmp_path), logger=False,
        )
        t2.load_checkpoint("latest")
        tp = jax.tree_util.tree_leaves(t.state.teacher_params)[0]
        tp2 = jax.tree_util.tree_leaves(t2.state.teacher_params)[0]
        np.testing.assert_allclose(tp, tp2)

    def test_mean_teacher_ema_moves_teacher(self, tmp_path):
        train, val = dual_loaders()
        model = ProbabilisticUnet(
            num_filters=FILTERS, no_convs_fcomb=3, beta=1.0, rl_swap=True,
        )
        t = MeanTeacherTrainer(
            "test-mt-ema", model, train, val,
            learning_rate=1e-2, save_root=str(tmp_path), logger=False,
            momentum=0.5,
        )
        t.initialize()
        teacher_before = jax.tree_util.tree_leaves(t.state.teacher_params)[0].copy()
        t.fit(2)
        teacher_after = jax.tree_util.tree_leaves(t.state.teacher_params)[0]
        assert not np.allclose(teacher_before, teacher_after)

    def test_warm_start_from_source(self, tmp_path):
        # Train a source PUNet, then warm-start MT student+teacher from it
        # (reference mean_teacher_trainer.py:44-50 / livecell_mt.py:94-97).
        train, val = sup_loaders(tmp_path)
        src = PUNetTrainer(
            "test-src", punet(), train, val,
            learning_rate=1e-3, save_root=str(tmp_path), logger=False,
        )
        src.fit(2)
        ckpt = str(tmp_path / "checkpoints" / "test-src" / "best.ckpt")

        dtrain, dval = dual_loaders()
        t = MeanTeacherTrainer(
            "test-mt-warm", punet(), dtrain, dval,
            learning_rate=1e-3, save_root=str(tmp_path), logger=False,
            ckpt_model=ckpt, ckpt_teacher=ckpt,
        )
        t.initialize()
        sp = jax.tree_util.tree_leaves(src.state.params)
        mp = jax.tree_util.tree_leaves(t.state.params)
        tp = jax.tree_util.tree_leaves(t.state.teacher_params)
        for a, b, c in zip(sp, mp, tp):
            np.testing.assert_allclose(a, b)
            np.testing.assert_allclose(a, c)

    def test_fixmatch_with_distribution_alignment(self, tmp_path):
        train, val = dual_loaders()
        model = ProbabilisticUnet(
            num_filters=FILTERS, no_convs_fcomb=3, beta=1.0,
            rl_swap=True, consensus_masking=True,
        )
        t = FixMatchTrainer(
            "test-fm", model, train, val,
            learning_rate=1e-3, save_root=str(tmp_path), logger=False,
            source_distribution=np.array([0.9, 0.1], dtype=np.float32),
        )
        _fit_and_check(t)


class TestJointTrainers:
    def test_adamt(self, tmp_path):
        strain, _ = sup_loaders(tmp_path)
        ttrain, tval = dual_loaders()
        model = ProbabilisticUnet(
            num_filters=FILTERS, no_convs_fcomb=3, beta=1.0,
            rl_swap=True, consensus_masking=True,
        )
        t = AdaMTTrainer(
            "test-adamt", model, strain, ttrain, tval,
            learning_rate=1e-3, save_root=str(tmp_path), logger=False,
        )
        _fit_and_check(t)
        assert t.state.teacher_params is not None

    def test_adamatch(self, tmp_path):
        strain, _ = sup_loaders(tmp_path)
        ttrain, tval = dual_loaders()
        model = ProbabilisticUnet(
            num_filters=FILTERS, no_convs_fcomb=3, beta=1.0,
            rl_swap=True, consensus_masking=True,
        )
        t = AdaMatchTrainer(
            "test-adamatch", model, strain, ttrain, tval,
            learning_rate=1e-3, save_root=str(tmp_path), logger=False,
        )
        _fit_and_check(t)
        assert t.state.teacher_params is None


class TestPlateauScheduler:
    def test_reduces_after_patience(self):
        sched = ReduceLROnPlateau(factor=0.5, patience=2)
        lr = 1.0
        lr = sched.step(1.0, lr)  # best=1.0
        assert lr == 1.0
        for _ in range(2):
            lr = sched.step(2.0, lr)  # bad epochs 1, 2
        assert lr == 1.0
        lr = sched.step(2.0, lr)  # bad epoch 3 > patience
        assert lr == 0.5

    def test_rel_threshold_matches_torch_default(self):
        # torch ReduceLROnPlateau(threshold=1e-4, mode='min', rel): an
        # improvement smaller than best*1e-4 counts as a BAD epoch — without
        # this, metric noise drifting down resets patience forever
        sched = ReduceLROnPlateau(factor=0.5, patience=1)
        lr = 1.0
        lr = sched.step(1.0, lr)          # best = 1.0
        lr = sched.step(0.99999, lr)      # < best but within rel threshold
        assert sched.num_bad_epochs == 1
        lr = sched.step(0.999985, lr)     # bad epoch 2 > patience -> reduce
        assert lr == 0.5
        lr = sched.step(0.9, lr)          # genuine improvement resets
        assert sched.num_bad_epochs == 0 and sched.best == 0.9

    def test_plain_optimizer_has_no_lr_and_raises_on_replace(self):
        import optax

        from pda.train.state import create_train_state

        params = {"w": jnp.ones((2,))}
        tx = optax.adam(1e-3)  # not inject_hyperparams-wrapped
        st = create_train_state(params, tx, jax.random.PRNGKey(0))
        assert st.learning_rate is None
        with pytest.raises(TypeError, match="inject_hyperparams"):
            st.replace_lr(1e-4)


class TestEmptyLoaderGuard:
    def test_fit_raises_on_zero_batches(self, tmp_path):
        # an empty train loader must error, not loop forever validating
        # (round-2 review finding on engine._fit_impl)
        raws, labels = make_dataset_arrays(2, (64, 64))
        ds = ImageCollectionDataset(
            raws, labels, patch_shape=PATCH, n_samples=0
        )
        _, val = sup_loaders(tmp_path)
        tr = PUNetTrainer(
            name="empty",
            model=punet(),
            train_loader=Loader(ds, 2, seed=0),
            val_loader=val,
            save_root=str(tmp_path),
            learning_rate=1e-3,
        )
        with pytest.raises(RuntimeError, match="zero batches"):
            tr.fit(2)

    def test_joint_fit_raises_when_zip_is_empty(self, tmp_path):
        # joint trainers zip source+target streams; an empty TARGET stream
        # with a non-empty source used to loop forever (init peeks only the
        # source loader)
        raws, labels = make_dataset_arrays(2, (64, 64))
        src_ds = ImageCollectionDataset(raws, labels, patch_shape=PATCH)
        empty = ImageCollectionDataset(
            raws, labels, patch_shape=PATCH, n_samples=0
        )
        aug = Compose(standardize)
        raws2, labels2 = make_dataset_arrays(2, (64, 64))
        dual_empty = DualImageCollectionDataset(
            raws2, labels2, patch_shape=PATCH, n_samples=0,
            augmentation1=aug, augmentation2=aug,
        )
        dual_val = DualImageCollectionDataset(
            raws2, labels2, patch_shape=PATCH,
            augmentation1=aug, augmentation2=aug,
        )
        tr = AdaMTTrainer(
            name="empty-joint",
            model=punet(),
            source_train_loader=Loader(src_ds, 2, seed=0),
            target_train_loader=Loader(dual_empty, 2, seed=0),
            val_loader=Loader(dual_val, 1, seed=1),
            save_root=str(tmp_path),
            learning_rate=1e-3,
        )
        with pytest.raises(RuntimeError, match="zero batches"):
            tr.fit(2)


class TestReconstructPosteriorMean:
    def test_posterior_mean_reconstruction_option(self):
        """reference elbo(reconstruct_posterior_mean=True): the recon term
        decodes the posterior MEAN while KL still uses the draw
        (probabilistic_unet.py:341,352-358)."""
        import jax
        import jax.numpy as jnp

        from pda.core import neg_elbo
        from pda.models import ProbabilisticUnet
        from pda.train.steps import _punet_loss

        model = ProbabilisticUnet(
            num_filters=(4, 8, 12, 16), no_convs_fcomb=3, beta=1.0,
            rl_swap=True,
        )
        x0 = jnp.zeros((1, 32, 32, 1))
        params = model.init(jax.random.PRNGKey(0), x0, x0)["params"]
        rng = jax.random.PRNGKey(3)
        x = jax.random.normal(rng, (2, 32, 32, 1))
        y = (jax.random.uniform(jax.random.PRNGKey(4), (2, 32, 32, 1)) > 0.5
             ).astype(jnp.float32)

        key = jax.random.PRNGKey(7)
        _, aux_mean = _punet_loss(model, params, x, y, key,
                                  reconstruct_posterior_mean=True)
        _, aux_draw = _punet_loss(model, params, x, y, key)

        # hand-build the expected mean-reconstruction value
        enc = model.apply({"params": params}, x, y, method="encode")
        recon_mu = model.apply(
            {"params": params}, enc.features, enc.posterior.mu, method="decode"
        )
        _, exp_aux = neg_elbo(recon_mu, y, enc.posterior, enc.prior,
                              beta=1.0, rl_swap=True)
        assert abs(float(aux_mean["recon_loss"]) - float(exp_aux["recon_loss"])
                   ) < 1e-4
        # and it differs from the draw-based reconstruction
        assert abs(float(aux_mean["recon_loss"]) - float(aux_draw["recon_loss"])
                   ) > 1e-6


class TestReferenceLoggerNames:
    def test_logger_class_argument(self, tmp_path):
        """The reference passes a LOGGER CLASS to the trainer constructor
        (prob_utils/my_trainer/__init__.py names; torch_em pattern). Passing
        one must construct it and write its log dir."""
        import os

        import jax
        import jax.numpy as jnp

        from pda.data import ImageCollectionDataset, Loader
        from pda.data.synthetic import make_dataset_arrays
        from pda.models import ProbabilisticUnet
        from pda.train import (
            AdaMatchLogger, AdaMTLogger, FixMatchLogger, MeanTeacherLogger,
            PseudoLogger, PUNetLogger, PUNetTrainer, TrainLogger,
        )

        for cls in (PUNetLogger, PseudoLogger, MeanTeacherLogger,
                    FixMatchLogger, AdaMTLogger, AdaMatchLogger):
            assert issubclass(cls, TrainLogger)
            assert cls.image_tags

        raws, labels = make_dataset_arrays(4, (32, 32))
        ds = ImageCollectionDataset(raws, labels, patch_shape=(32, 32))
        model = ProbabilisticUnet(num_filters=(2, 4, 6, 8), no_convs_fcomb=3)
        t = PUNetTrainer(
            "logcls", model, Loader(ds, 2, seed=0), Loader(ds, 2, seed=1),
            learning_rate=1e-3, save_root=str(tmp_path), logger=PUNetLogger,
        )
        assert isinstance(t.logger, PUNetLogger)
        t.fit(2)
        assert os.path.isdir(tmp_path / "logs" / "logcls")
