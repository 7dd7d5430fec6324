"""Data pipeline tests: transforms, datasets, rejection sampling, loader."""

import numpy as np
import pytest

from pda.data import (
    AdditiveGaussianNoise,
    Compose,
    DualImageCollectionDataset,
    DualRawImageCollectionDataset,
    GaussianBlur,
    ImageCollectionDataset,
    Loader,
    MinForegroundSampler,
    RandomApply,
    RandomContrast,
    SegmentationDataset,
    boundary_transform,
    get_augmentations,
    labels_to_binary,
    standardize,
)
from pda.data.synthetic import make_consensus_arrays, make_dataset_arrays


class TestTransforms:
    def test_standardize(self, rng):
        x = rng.normal(5.0, 3.0, size=(64, 64)).astype(np.float32)
        out = standardize(x)
        assert abs(out.mean()) < 1e-4 and abs(out.std() - 1.0) < 1e-3

    def test_gaussian_blur_smooths(self, rng):
        x = rng.normal(size=(64, 64)).astype(np.float32)
        out = GaussianBlur(sigma=(2.0, 2.0))(x, np.random.default_rng(0))
        assert out.std() < x.std()

    def test_additive_noise_changes_input(self, rng):
        x = np.zeros((32, 32), dtype=np.float32)
        out = AdditiveGaussianNoise(scale=(0.1, 0.15))(x, np.random.default_rng(0))
        assert out.std() > 0

    def test_random_contrast(self):
        x = np.linspace(0, 1, 64, dtype=np.float32).reshape(8, 8)
        out = RandomContrast(alpha=(2.0, 2.0))(x, np.random.default_rng(0))
        np.testing.assert_allclose(out.mean(), x.mean(), atol=1e-5)
        assert out.std() > x.std() * 1.5

    def test_random_apply_probability_zero_is_identity(self, rng):
        x = rng.normal(size=(16, 16)).astype(np.float32)
        aug = RandomApply([GaussianBlur()], p=0.0)
        np.testing.assert_array_equal(aug(x, np.random.default_rng(0)), x)

    def test_compose_with_weak_aug_recipe(self, rng):
        # The reference weak-aug recipe (livecell_mt.py:16-26).
        aug = Compose(
            standardize,
            RandomApply([GaussianBlur()], p=0.25),
            RandomApply([AdditiveGaussianNoise(scale=(0, 0.15))], p=0.25),
        )
        x = rng.normal(size=(32, 32)).astype(np.float32)
        out = aug(x, np.random.default_rng(0))
        assert out.shape == x.shape and np.isfinite(out).all()

    def test_joint_augmentations_keep_pairing(self, rng):
        aug = get_augmentations(2)
        raw = rng.normal(size=(16, 16)).astype(np.float32)
        out_raw, out_lab = aug([raw, raw.copy()], np.random.default_rng(3))
        np.testing.assert_array_equal(out_raw, out_lab)

    def test_elastic_deformation_deterministic_and_joint(self, rng):
        # elastic on by default (p=0.25, torch_em get_augmentations parity);
        # same seed -> same warp; labels stay binary (nearest interpolation)
        from pda.data.transforms import JointAugmentations

        aug = JointAugmentations(p_flip=0.0, p_elastic=1.0)
        raw = np.random.default_rng(3).random((48, 48)).astype(np.float32)
        lab = (raw > 0.5).astype(np.float32)
        r1, l1 = aug([raw, lab], np.random.default_rng(7))
        r2, l2 = aug([raw, lab], np.random.default_rng(7))
        np.testing.assert_array_equal(r1, r2)
        np.testing.assert_array_equal(l1, l2)
        assert not np.allclose(r1, raw)  # it actually warped
        assert set(np.unique(l1)).issubset({0.0, 1.0})  # binary stays binary
        # picklable for worker handoff
        import pickle

        pickle.loads(pickle.dumps(aug))

    def test_labels_to_binary(self):
        lab = np.array([[0, 1], [2, 0]])
        np.testing.assert_array_equal(labels_to_binary(lab), [[0, 1], [1, 0]])

    def test_boundary_transform(self):
        lab = np.zeros((4, 4))
        lab[1:3, 1:3] = 1
        b = boundary_transform(lab)
        assert b[1, 1] == 1.0 and b[0, 0] == 0.0


class TestDatasets:
    def test_image_collection_shapes(self):
        raws, labels = make_dataset_arrays(3, (64, 64))
        ds = ImageCollectionDataset(raws, labels, patch_shape=(32, 32))
        x, y = ds[0]
        assert x.shape == (32, 32, 1) and y.shape == (32, 32, 1)
        assert x.dtype == np.float32

    def test_image_collection_with_consensus(self):
        raws, labels = make_dataset_arrays(2, (64, 64))
        cons = make_consensus_arrays(labels)
        ds = ImageCollectionDataset(raws, labels, cons, patch_shape=(32, 32))
        x, y, z = ds[0]
        assert z.shape == (32, 32, 1)

    def test_dual_dataset_views_differ(self):
        raws, labels = make_dataset_arrays(2, (64, 64))
        aug = Compose(standardize, AdditiveGaussianNoise(scale=(0.1, 0.2)))
        ds = DualImageCollectionDataset(
            raws, labels, patch_shape=(32, 32), augmentation1=aug, augmentation2=aug
        )
        x, x1, x2, y = ds[0]
        assert x.shape == x1.shape == x2.shape == (32, 32, 1)
        assert not np.allclose(x1, x2)

    def test_dual_raw_dataset_dummy_labels(self):
        raws, _ = make_dataset_arrays(2, (64, 64))
        aug = Compose(standardize)
        ds = DualRawImageCollectionDataset(
            raws, patch_shape=(32, 32), augmentation1=aug, augmentation2=aug
        )
        x, x1, x2, y = ds[0]
        assert set(np.unique(y)).issubset({0.0, 1.0})

    def test_dual_dataset_without_augs_returns_pairs(self):
        # Reference semantics (my_image_collection_dataset.py:369-372): no
        # augmentations -> plain (x, y) tuples.
        raws, labels = make_dataset_arrays(2, (64, 64))
        ds = DualImageCollectionDataset(raws, labels, patch_shape=(32, 32))
        out = ds[0]
        assert len(out) == 2

    def test_min_foreground_sampler_rejects_empty(self):
        raws = [np.zeros((64, 64), dtype=np.float32)]
        labels = [np.zeros((64, 64), dtype=np.float32)]
        labels[0][:32, :32] = 1.0  # only one quadrant has foreground
        ds = ImageCollectionDataset(
            raws,
            labels,
            patch_shape=(8, 8),
            sampler=MinForegroundSampler(min_fraction=0.5),
            transform=None,
        )
        for i in range(5):
            _, y = ds[i]
            assert y.mean() > 0.5

    def test_sampler_exhaustion_raises(self):
        raws = [np.zeros((64, 64), dtype=np.float32)]
        labels = [np.zeros((64, 64), dtype=np.float32)]
        ds = ImageCollectionDataset(
            raws, labels, patch_shape=(8, 8),
            sampler=MinForegroundSampler(min_fraction=0.5),
        )
        with pytest.raises(RuntimeError):
            ds[0]

    def test_n_samples_extends_length(self):
        raws, labels = make_dataset_arrays(2, (64, 64))
        ds = ImageCollectionDataset(raws, labels, patch_shape=(32, 32), n_samples=50)
        assert len(ds) == 50

    def test_segmentation_dataset_h5_volume(self, tmp_path):
        import h5py

        vol = np.random.default_rng(0).random((4, 64, 64)).astype(np.float32)
        lab = (vol > 0.5).astype(np.float32)
        p = tmp_path / "vol.h5"
        with h5py.File(p, "w") as f:
            f.create_dataset("raw", data=vol)
            f.create_dataset("labels", data=lab)
        ds = SegmentationDataset(
            str(p), str(p), raw_key="raw", label_key="labels", patch_shape=(32, 32)
        )
        x, y = ds[0]
        assert x.shape == (32, 32, 1) and y.shape == (32, 32, 1)

    def test_segmentation_dataset_roi(self, tmp_path):
        import h5py

        vol = np.random.default_rng(0).random((10, 64, 64)).astype(np.float32)
        p = tmp_path / "vol.h5"
        with h5py.File(p, "w") as f:
            f.create_dataset("raw", data=vol)
            f.create_dataset("labels", data=(vol > 0.5).astype("float32"))
        ds = SegmentationDataset(
            str(p), str(p), raw_key="raw", label_key="labels",
            patch_shape=(32, 32), roi=slice(0, 3),
        )
        assert len(ds) == 3

    def test_segmentation_dataset_lazy_windows(self, tmp_path, monkeypatch):
        # Volumes above EAGER_LIMIT_BYTES stream crops through windowed H5
        # reads instead of materializing in RAM (the reference reads lazily
        # through elf, my_segmentation_datasets.py:56-70). Force the limit to
        # 0 so a small volume exercises the lazy path end-to-end.
        import pickle

        import h5py

        from pda.data.datasets import LazyH5Volume

        vol = np.random.default_rng(1).random((6, 64, 64)).astype(np.float32)
        p = tmp_path / "big.h5"
        with h5py.File(p, "w") as f:
            f.create_dataset("raw", data=vol, chunks=(1, 64, 64), compression="gzip")
            f.create_dataset("labels", data=(vol > 0.5).astype("float32"))
        monkeypatch.setattr(SegmentationDataset, "EAGER_LIMIT_BYTES", 0)
        ds = SegmentationDataset(
            str(p), str(p), raw_key="raw", label_key="labels",
            patch_shape=(32, 32), roi=slice(1, 5),
        )
        assert isinstance(ds.raw, LazyH5Volume)
        assert ds.raw.shape == (4, 64, 64) and len(ds) == 4
        np.testing.assert_allclose(ds.raw[2], vol[3])  # roi offset applied
        x, y = ds[0]
        assert x.shape == (32, 32, 1) and y.shape == (32, 32, 1)
        # pickle round-trip (worker handoff) reopens the file on demand
        ds2 = pickle.loads(pickle.dumps(ds))
        x2, y2 = ds2[0]
        np.testing.assert_allclose(x2, x)


class TestLoader:
    def test_batches_are_nhwc(self):
        raws, labels = make_dataset_arrays(8, (64, 64))
        ds = ImageCollectionDataset(raws, labels, patch_shape=(32, 32))
        loader = Loader(ds, batch_size=4)
        batches = list(loader)
        assert len(batches) == len(loader) == 2
        x, y = batches[0]
        assert x.shape == (4, 32, 32, 1)

    def test_workers_match_serial(self):
        raws, labels = make_dataset_arrays(8, (64, 64))
        ds = ImageCollectionDataset(raws, labels, patch_shape=(32, 32))
        serial = list(Loader(ds, batch_size=4, num_workers=0, seed=7))
        threaded = list(Loader(ds, batch_size=4, num_workers=4, seed=7))
        for (a, b), (c, d) in zip(serial, threaded):
            np.testing.assert_array_equal(a, c)
            np.testing.assert_array_equal(b, d)

    def test_shuffle_changes_order_between_epochs(self):
        raws, labels = make_dataset_arrays(16, (64, 64))
        ds = ImageCollectionDataset(raws, labels, patch_shape=(32, 32))
        loader = Loader(ds, batch_size=4, shuffle=True, seed=1)
        e1 = np.concatenate([b[0] for b in loader])
        e2 = np.concatenate([b[0] for b in loader])
        assert not np.allclose(e1, e2)


class _UnpicklableDataset:
    """Wraps a dataset with a lambda member so it cannot ship to process
    workers — forces the thread-fallback warning path."""

    def __init__(self, inner):
        self.inner = inner
        self._lambda = lambda: None  # unpicklable on purpose

    def __len__(self):
        return len(self.inner)

    def sample(self, index, rng):
        return self.inner.sample(index, rng)


class TestLoaderPoolPaths:
    """Execute the REAL scaling paths (shm process pool, slot management,
    thread fallback) even on this single-core host via ``force_workers``
    (VERDICT r4: the pool paths previously never ran under test — the
    1-core inline fallback made worker tests compare inline vs inline)."""

    def _dataset(self):
        raws, labels = make_dataset_arrays(8, (64, 64))
        return ImageCollectionDataset(raws, labels, patch_shape=(32, 32))

    def test_process_pool_matches_inline(self):
        ds = self._dataset()
        serial = list(Loader(ds, batch_size=4, num_workers=0, seed=7))
        loader = Loader(
            ds, batch_size=4, num_workers=2, seed=7, force_workers=True
        )
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("error")  # a fallback warning = failure
            pooled = list(loader)
        assert loader._pool is not None and loader._pool[0] == "process"
        assert len(pooled) == len(serial) == 2
        for (a, b), (c, d) in zip(serial, pooled):
            np.testing.assert_array_equal(a, c)
            np.testing.assert_array_equal(b, d)
        # epoch 2 through the SAME live pool still matches a fresh inline run
        serial2 = list(Loader(ds, batch_size=4, num_workers=0, seed=7))[0]
        pooled2 = list(loader)  # epoch advanced: order differs from epoch 1
        serial_l2 = Loader(ds, batch_size=4, num_workers=0, seed=7)
        list(serial_l2)
        serial_e2 = list(serial_l2)
        for (a, b), (c, d) in zip(serial_e2, pooled2):
            np.testing.assert_array_equal(a, c)
            np.testing.assert_array_equal(b, d)
        del serial2

    def test_process_pool_slot_exhaustion_raises(self):
        raws, labels = make_dataset_arrays(32, (64, 64))
        ds = ImageCollectionDataset(raws, labels, patch_shape=(32, 32))
        loader = Loader(
            ds, batch_size=4, num_workers=2, seed=3, force_workers=True
        )
        it1 = iter(loader)
        next(it1)  # pool live; prefetch depth keeps most slots in flight
        it2 = iter(loader)
        with pytest.raises(RuntimeError, match="no free shared-memory slot"):
            for _ in it2:
                pass
        # draining the first iterator returns every slot
        for _ in it1:
            pass
        assert sorted(loader._free_slots) == list(range(loader._n_slots))
        # and a fresh iterator works again end to end
        assert len(list(loader)) == 8

    def test_unpicklable_dataset_falls_back_to_threads_with_warning(self):
        ds = _UnpicklableDataset(self._dataset())
        serial = list(Loader(ds, batch_size=4, num_workers=0, seed=5))
        loader = Loader(
            ds, batch_size=4, num_workers=2, seed=5, force_workers=True
        )
        with pytest.warns(RuntimeWarning, match="falling back to thread"):
            pooled = list(loader)
        assert loader._pool is not None and loader._pool[0] == "thread"
        for (a, b), (c, d) in zip(serial, pooled):
            np.testing.assert_array_equal(a, c)
            np.testing.assert_array_equal(b, d)


class TestReviewRegressions:
    """Regressions for the round-2 review findings (data path)."""

    def test_nonsquare_patches_stack(self):
        # odd quarter-turns must be suppressed on non-square patches or
        # samples become un-stackable mid-epoch
        from pda.data.transforms import get_augmentations

        aug = get_augmentations(ndim=2, p_elastic=0.0)
        raws, labels = make_dataset_arrays(4, (96, 64))
        ds = ImageCollectionDataset(
            raws, labels, patch_shape=(64, 32), transform=aug
        )
        for i in range(8):
            x, y = ds[i % len(ds)]
            assert x.shape == (64, 32, 1), x.shape
            assert y.shape == (64, 32, 1), y.shape

    def test_square_patches_still_rotate(self):
        from pda.data.transforms import get_augmentations

        aug = get_augmentations(ndim=2, p_elastic=0.0)
        rng = np.random.default_rng(3)
        a = np.arange(16.0, dtype=np.float32).reshape(4, 4, 1)
        rotated = False
        for _ in range(32):
            (out,) = aug([a], rng)
            assert out.shape == a.shape
            if not np.array_equal(out, a):
                rotated = True
        assert rotated

    def test_gaussian_blur_fallback_keeps_channels_independent(self, monkeypatch):
        from pda.data import transforms as T

        monkeypatch.setattr(T, "_HAS_CV2", False)
        rng = np.random.default_rng(0)
        x = np.zeros((33, 33, 2), np.float32)
        x[16, 16, 0] = 1.0  # impulse in channel 0 only
        out = T.GaussianBlur(sigma=(2.0, 2.0))(x, rng)
        assert float(np.abs(out[..., 1]).max()) == 0.0, "channel bleed"
        assert float(out[..., 0].max()) > 0.0

    def test_compose_rng_dispatch_by_signature(self):
        from pda.data.transforms import Compose, standardize

        seen = {}

        def takes_rng(x, rng):
            seen["rng"] = rng
            return x

        def no_rng(x):
            return x + 1.0

        rng = np.random.default_rng(0)
        x = np.ones((4, 4), np.float32) * 5.0
        out = Compose(standardize, takes_rng, no_rng)(x, rng)
        assert seen["rng"] is rng
        assert np.isfinite(out).all()

    def test_lazy_h5_rejects_negative_step(self, tmp_path, monkeypatch):
        import h5py

        from pda.data.datasets import LazyH5Volume

        p = tmp_path / "v.h5"
        with h5py.File(p, "w") as f:
            f.create_dataset("raw", data=np.arange(24.0).reshape(6, 2, 2))
        vol = LazyH5Volume(str(p), "raw", roi=slice(1, 5))
        with pytest.raises(IndexError):
            vol[::-1]

    def test_image_cache_is_bounded(self, tmp_path):
        import imageio.v3 as iio

        raws, labels = make_dataset_arrays(8, (32, 32))
        ipaths, lpaths = [], []
        for i, (r, l) in enumerate(zip(raws, labels)):
            ip, lp = tmp_path / f"i{i}.tif", tmp_path / f"l{i}.tif"
            iio.imwrite(ip, r.astype(np.float32))
            iio.imwrite(lp, l.astype(np.uint8))
            ipaths.append(str(ip)); lpaths.append(str(lp))
        ds = ImageCollectionDataset(ipaths, lpaths, patch_shape=(16, 16))
        ds._cache_max = 3
        for i in range(len(ds)):
            ds[i]
        assert len(ds._cache) <= 3
