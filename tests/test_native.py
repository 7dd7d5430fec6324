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
