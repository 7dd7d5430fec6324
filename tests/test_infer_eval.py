"""Inference + evaluation tests: tile/stitch identity, MC prediction,
pseudo-label export/ingest round-trip, dice runners."""

import os

import pytest

pytestmark = pytest.mark.slow  # fit()-heavy suite; default run skips, use --runslow

import jax
import jax.numpy as jnp
import numpy as np

from pda.eval import run_dice_evaluation, run_lung_dice_evaluation
from pda.infer import (
    extract_tiles,
    pad_to_divisible,
    punet_prediction,
    punet_pseudo_prediction,
    stitch_tiles,
    tile_standardize,
    unet_prediction,
)
from pda.models import ProbabilisticUnet, UNet2d

FILTERS = (4, 8, 12, 16)


def small_punet_params(hw=64):
    model = ProbabilisticUnet(
        num_filters=FILTERS, no_convs_fcomb=3, beta=1.0, rl_swap=True
    )
    x = jnp.zeros((1, hw, hw, 1))
    y = jnp.zeros((1, hw, hw, 1))
    params = model.init(jax.random.PRNGKey(0), x, y)["params"]
    return model, params


class TestTiling:
    def test_extract_stitch_identity(self):
        # SURVEY.md section 4.1: tile/halo stitch must reconstruct identity.
        rng = np.random.default_rng(0)
        for shape in [(100, 130), (64, 64), (130, 90)]:
            img = jnp.asarray(rng.normal(size=(*shape, 1)).astype(np.float32))
            tiles = extract_tiles(img, (64, 64), (16, 16))
            out = stitch_tiles(tiles, shape, (64, 64), (16, 16))
            np.testing.assert_allclose(out, img, rtol=1e-6)

    def test_tile_shapes(self):
        img = jnp.zeros((520, 704, 1))  # LIVECell frame geometry
        tiles = extract_tiles(img, (384, 384), (64, 64))
        assert tiles.shape == (4, 512, 512, 1)

    def test_tile_standardize(self):
        rng = np.random.default_rng(1)
        tiles = jnp.asarray(rng.normal(3.0, 2.0, size=(4, 32, 32, 1)).astype(np.float32))
        out = tile_standardize(tiles)
        means = np.asarray(out).mean(axis=(1, 2, 3))
        stds = np.asarray(out).std(axis=(1, 2, 3))
        np.testing.assert_allclose(means, 0.0, atol=1e-5)
        np.testing.assert_allclose(stds, 1.0, atol=1e-3)

    def test_pad_to_divisible(self):
        img = jnp.zeros((50, 70, 1))
        padded, (h, w) = pad_to_divisible(img, (16, 16))
        assert padded.shape == (64, 80, 1) and (h, w) == (50, 70)


class TestPredictionPipelines:
    def _write_inputs(self, tmp_path, n=2, shape=(100, 120)):
        import imageio.v3 as imageio

        rng = np.random.default_rng(0)
        in_dir = tmp_path / "inputs"
        os.makedirs(in_dir, exist_ok=True)
        for i in range(n):
            img = (rng.random(shape) * 255).astype(np.uint8)
            imageio.imwrite(in_dir / f"img_{i}.tif", img)
        return str(in_dir)

    def test_punet_prediction_writes_prob_maps(self, tmp_path):
        import imageio.v3 as imageio

        in_dir = self._write_inputs(tmp_path)
        model, params = small_punet_params()
        out_dir = str(tmp_path / "preds")
        punet_prediction(
            in_dir + "/*.tif", out_dir, model, params,
            prior_samples=2, block_shape=(64, 64), halo=(16, 16), verbose=False,
        )
        preds = sorted(os.listdir(out_dir))
        assert preds == ["img_0.tif", "img_1.tif"]
        pred = imageio.imread(os.path.join(out_dir, "img_0.tif"))
        assert pred.shape == (100, 120)
        assert pred.min() >= 0.0 and pred.max() <= 1.0

    def test_punet_prediction_tiff_extension_and_dir_glob(self, tmp_path):
        """.tiff inputs keep their stem (no [:-4] mangling) and directory
        patterns expand to all image extensions, not just *.tif."""
        import imageio.v3 as imageio

        rng = np.random.default_rng(0)
        in_dir = tmp_path / "tiffs"
        os.makedirs(in_dir)
        imageio.imwrite(
            in_dir / "cell_a.tiff", (rng.random((72, 72)) * 255).astype(np.uint8)
        )
        imageio.imwrite(
            in_dir / "cell_b.png", (rng.random((72, 72)) * 255).astype(np.uint8)
        )
        model, params = small_punet_params()
        out_dir = str(tmp_path / "preds")
        punet_prediction(
            str(in_dir), out_dir, model, params,
            prior_samples=2, block_shape=(64, 64), halo=(8, 8), verbose=False,
        )
        assert sorted(os.listdir(out_dir)) == ["cell_a.tif", "cell_b.tif"]

    def test_pseudo_prediction_export_tree(self, tmp_path):
        import imageio.v3 as imageio

        in_dir = self._write_inputs(tmp_path, shape=(64, 80))
        model, params = small_punet_params()
        out = str(tmp_path / "pseudo") + os.sep
        punet_pseudo_prediction(
            in_dir, out, model, params,
            prior_samples=4, cellname="img", split_name="train", verbose=False,
        )
        ann = os.path.join(out, "annotations", "train", "img")
        con = os.path.join(out, "consensus", "train", "img")
        assert sorted(os.listdir(ann)) == ["img_0.tif", "img_1.tif"]
        pseudo = imageio.imread(os.path.join(ann, "img_0.tif"))
        cons = imageio.imread(os.path.join(con, "img_0.tif"))
        assert pseudo.shape == (64, 80) and cons.shape == (64, 80)
        assert cons.dtype == np.uint8
        assert set(np.unique(cons)).issubset({0, 1})

    def test_pseudo_labels_ingestable_by_dataset(self, tmp_path):
        """Export -> ingest round-trip (SURVEY.md section 4.2)."""
        from pda.data import ImageCollectionDataset, Loader

        in_dir = self._write_inputs(tmp_path, shape=(64, 80))
        model, params = small_punet_params()
        out = str(tmp_path / "pseudo") + os.sep
        punet_pseudo_prediction(
            in_dir, out, model, params,
            prior_samples=4, cellname="img", split_name="train", verbose=False,
        )
        from glob import glob

        raws = sorted(glob(in_dir + "/*.tif"))
        anns = sorted(glob(os.path.join(out, "annotations", "train", "img", "*.tif")))
        cons = sorted(glob(os.path.join(out, "consensus", "train", "img", "*.tif")))
        ds = ImageCollectionDataset(raws, anns, cons, patch_shape=(32, 32))
        x, y, z = next(iter(Loader(ds, 2)))
        assert x.shape == (2, 32, 32, 1) and z.shape == (2, 32, 32, 1)

    def test_unet_prediction_padded_and_tiled(self, tmp_path):
        import imageio.v3 as imageio

        in_dir = self._write_inputs(tmp_path, n=1, shape=(70, 90))
        model = UNet2d(depth=2, initial_features=4)
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)))["params"]
        for tiling in (True, False):
            out_dir = str(tmp_path / f"unet_{tiling}")
            unet_prediction(
                in_dir + "/*.tif", out_dir, model, params,
                tiling=tiling, block_shape=(64, 64), halo=(8, 8), verbose=False,
            )
            pred = imageio.imread(os.path.join(out_dir, "img_0.tif"))
            assert pred.shape == (70, 90)


class TestDiceRunners:
    def test_run_dice_evaluation(self, tmp_path):
        import imageio.v3 as imageio

        gt_dir = tmp_path / "gt"
        pred_dir = tmp_path / "pred"
        os.makedirs(gt_dir)
        os.makedirs(pred_dir)
        gt = np.zeros((32, 32), dtype=np.uint8)
        gt[8:24, 8:24] = 255
        imageio.imwrite(gt_dir / "a.tif", gt)
        imageio.imwrite(pred_dir / "a.tif", (gt > 0).astype(np.float32))
        score = run_dice_evaluation(str(gt_dir / "*.tif"), str(pred_dir), verbose=False)
        assert abs(score - 1.0) < 1e-5

    def test_run_lung_dice_evaluation(self, tmp_path):
        import imageio.v3 as imageio

        gt_dir = tmp_path / "gt"
        pred_dir = tmp_path / "pred"
        os.makedirs(gt_dir)
        os.makedirs(pred_dir)
        gt = np.zeros((32, 32), dtype=np.uint8)
        gt[:16] = 255
        imageio.imwrite(gt_dir / "b.png", gt)
        # half-overlapping prediction
        pred = np.zeros((32, 32), dtype=np.float32)
        pred[8:24] = 1.0
        imageio.imwrite(pred_dir / "b.tif", pred)
        score = run_lung_dice_evaluation(
            str(gt_dir) + os.sep, str(pred_dir) + os.sep, "nih", verbose=False
        )
        assert abs(score - 0.5) < 1e-2

    def test_run_lung_dice_evaluation_jsrt2_fallback(self, tmp_path):
        """jsrt2 remap drops a 6-char annotation suffix; when predictions
        aren't named that way (e.g. smoke fixtures) the identity mapping
        must be used instead of failing."""
        import imageio.v3 as imageio

        gt_dir = tmp_path / "gt"
        pred_dir = tmp_path / "pred"
        os.makedirs(gt_dir)
        os.makedirs(pred_dir)
        gt = np.zeros((32, 32), dtype=np.uint8)
        gt[:16] = 255
        # real-JSRT-style pair: remap drops 10 chars -> pred 'case01.tif'
        imageio.imwrite(gt_dir / "case01_msk06.png", gt)
        imageio.imwrite(pred_dir / "case01.tif", (gt > 0).astype(np.float32))
        score = run_lung_dice_evaluation(
            str(gt_dir) + os.sep, str(pred_dir) + os.sep, "jsrt2", verbose=False
        )
        assert abs(score - 1.0) < 1e-5
        # synthetic naming: GT 'b.png' -> pred 'b.tif' via the fallback
        gt2_dir = tmp_path / "gt2"
        pred2_dir = tmp_path / "pred2"
        os.makedirs(gt2_dir)
        os.makedirs(pred2_dir)
        imageio.imwrite(gt2_dir / "b.png", gt)
        imageio.imwrite(pred2_dir / "b.tif", (gt > 0).astype(np.float32))
        score = run_lung_dice_evaluation(
            str(gt2_dir) + os.sep, str(pred2_dir) + os.sep, "jsrt2", verbose=False
        )
        assert abs(score - 1.0) < 1e-5


class TestPseudoPredictionGuards:
    def test_empty_glob_fails_before_wiping_exports(self, tmp_path):
        """A glob matching nothing must raise BEFORE clean_folder deletes the
        previous export tree (round-2 review finding)."""
        import imageio.v3 as imageio

        out = str(tmp_path / "pseudo") + os.sep
        prior = os.path.join(out, "annotations", "train", "img")
        os.makedirs(prior)
        imageio.imwrite(
            os.path.join(prior, "old.tif"), np.zeros((8, 8), np.float32)
        )
        empty_in = tmp_path / "imgs"
        empty_in.mkdir()
        with pytest.raises(FileNotFoundError, match="no input images"):
            punet_pseudo_prediction(
                str(empty_in), out, None, None,
                prior_samples=2, cellname="img", split_name="train",
                verbose=False,
            )
        # the stale export survived the failed call
        assert os.listdir(prior) == ["old.tif"]
