"""Native (C++) data-path library tests: build, correctness vs numpy/cv2."""

import numpy as np
import pytest

from pda.data import native
from pda.data.transforms import GaussianBlur, standardize

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library could not be built"
)


class TestNative:
    def test_standardize_matches_numpy(self, rng):
        x = rng.normal(3.0, 2.0, size=(64, 64)).astype(np.float32)
        expected = standardize(x.copy())
        out = native.standardize(x.copy())
        np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-6)

    def test_crop_matches_slicing(self, rng):
        x = rng.normal(size=(100, 120)).astype(np.float32)
        out = native.crop(x, 10, 20, 32, 48)
        np.testing.assert_array_equal(out, x[10:42, 20:68])

    def test_blur_close_to_cv2(self, rng):
        x = rng.normal(size=(64, 64)).astype(np.float32)
        ours = native.gaussian_blur(x, 2.0)
        ref = GaussianBlur(sigma=(2.0, 2.0))(x, np.random.default_rng(0))
        # different truncation radii -> small differences away from borders
        np.testing.assert_allclose(
            ours[8:-8, 8:-8], ref[8:-8, 8:-8], rtol=5e-2, atol=5e-3
        )

    def test_noise_statistics(self):
        x = np.zeros((256, 256), dtype=np.float32)
        out = native.add_gaussian_noise(x, 0.5, seed=42)
        assert abs(out.std() - 0.5) < 0.01
        assert abs(out.mean()) < 0.01

    def test_noise_deterministic_per_seed(self):
        a = native.add_gaussian_noise(np.zeros((32, 32), np.float32), 1.0, seed=7)
        b = native.add_gaussian_noise(np.zeros((32, 32), np.float32), 1.0, seed=7)
        c = native.add_gaussian_noise(np.zeros((32, 32), np.float32), 1.0, seed=8)
        np.testing.assert_array_equal(a, b)
        assert not np.allclose(a, c)

    def test_contrast_matches_formula(self, rng):
        x = rng.normal(size=(32, 32)).astype(np.float32)
        expected = x.mean() + 2.0 * (x - x.mean())
        out = native.random_contrast(x.copy(), 2.0)
        np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-5)

    def test_fused_weak_augment_runs_and_standardizes(self, rng):
        x = rng.normal(5.0, 3.0, size=(64, 64)).astype(np.float32)
        out = native.weak_augment(x, p=0.0, seed=1)  # p=0: standardize only
        assert abs(out.mean()) < 1e-3 and abs(out.std() - 1.0) < 1e-2

    def test_native_aug_in_dataset_pipeline(self):
        from pda.data import DualImageCollectionDataset
        from pda.data.synthetic import make_dataset_arrays

        raws, labels = make_dataset_arrays(2, (64, 64))
        aug = native.NativeWeakAugmentation()
        ds = DualImageCollectionDataset(
            raws, labels, patch_shape=(32, 32),
            augmentation1=aug, augmentation2=aug,
        )
        x, x1, x2, y = ds[0]
        assert x1.shape == (32, 32, 1) and np.isfinite(x1).all()


class TestElasticWarpNative:
    """Native elastic warp + field upsample vs the scipy/numpy references."""

    def test_warp_matches_scipy(self):
        native = pytest.importorskip("pda.data.native")
        if not native.available():
            pytest.skip("native lib unavailable")
        scipy_nd = pytest.importorskip("scipy.ndimage")
        rng = np.random.default_rng(0)
        a = rng.normal(size=(64, 48)).astype(np.float32)
        dy = (rng.normal(size=(64, 48)) * 9).astype(np.float32)
        dx = (rng.normal(size=(64, 48)) * 9).astype(np.float32)
        yy, xx = np.meshgrid(np.arange(64), np.arange(48), indexing="ij")
        coords = np.stack([yy + dy, xx + dx])
        for order in (0, 1):
            ref = scipy_nd.map_coordinates(a, coords, order=order, mode="reflect")
            out = native.elastic_warp(a, dy, dx, order=order)
            np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)

    def test_field_matches_numpy(self, monkeypatch):
        native = pytest.importorskip("pda.data.native")
        if not native.available():
            pytest.skip("native lib unavailable")
        from pda.data.transforms import JointAugmentations

        j = JointAugmentations()
        monkeypatch.setenv("PDA_NATIVE_AUGS", "0")
        f_np = j._field(96, 80, np.random.default_rng(3))
        monkeypatch.setenv("PDA_NATIVE_AUGS", "1")
        f_nat = j._field(96, 80, np.random.default_rng(3))
        np.testing.assert_allclose(f_nat, f_np, rtol=1e-5, atol=1e-5)

    def test_joint_augs_deterministic_native(self):
        from pda.data.transforms import JointAugmentations

        j = JointAugmentations(p_elastic=1.0)
        img = np.random.default_rng(0).normal(size=(64, 64)).astype(np.float32)
        lab = (img > 0).astype(np.float32)
        o1 = j([img, lab], np.random.default_rng(9))
        o2 = j([img, lab], np.random.default_rng(9))
        for a, b in zip(o1, o2):
            np.testing.assert_array_equal(a, b)
        assert set(np.unique(o1[1])) <= {0.0, 1.0}  # labels stay binary


def test_mutating_kernels_never_alias_input():
    """A full-width crop is a contiguous VIEW of the source image; the
    in-place C kernels must operate on an owned copy, never the view
    (regression: standardize/weak_augment corrupted cached source arrays
    when the patch width equaled the image width)."""
    from pda.data import native

    if not native.available():
        import pytest

        pytest.skip("native lib unavailable")
    import numpy as np

    src = np.random.default_rng(0).normal(size=(64, 32)).astype(np.float32)
    view = src[10:42, :]  # full-width crop: contiguous view
    assert view.base is src
    before = src.copy()
    native.standardize(view)
    native.weak_augment(view, p=1.0, seed=3)
    native.add_gaussian_noise(view, 0.1, 5)
    native.random_contrast(view, 1.3)
    np.testing.assert_array_equal(src, before)


class TestBlurGeometry:
    def test_thin_image_matches_cv2(self):
        """Kernels wider than an axis must still match cv2 (iterated
        reflect101 borders — round-2 review finding)."""
        cv2 = pytest.importorskip("cv2")
        if not native.available():
            pytest.skip("native library unavailable")
        rng = np.random.default_rng(0)
        for shape, sigma in [((8, 512), 3.0), ((512, 8), 3.0),
                             ((5, 300), 4.0), ((3, 3), 5.0), ((1, 64), 2.0)]:
            x = rng.random(shape).astype(np.float32)
            ours = native.gaussian_blur(x, sigma)
            ref = cv2.GaussianBlur(x, (0, 0), sigma)
            np.testing.assert_allclose(ours, ref, atol=2e-5)

    def test_blur_and_warp_reject_multichannel(self):
        if not native.available():
            pytest.skip("native library unavailable")
        x = np.zeros((8, 8, 3), np.float32)
        with pytest.raises(ValueError):
            native.gaussian_blur(x, 2.0)
        with pytest.raises(ValueError):
            native.elastic_warp(x, np.zeros((8, 8), np.float32),
                                np.zeros((8, 8), np.float32))
