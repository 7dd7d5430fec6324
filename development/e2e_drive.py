"""End-to-end synthetic drive: train -> ckpt -> MT warm start
-> tiled MC prediction -> pseudo export -> dice eval. CPU, small model.

SELF-VALIDATING (VERDICT r2 next-round #8): trains long enough that the
final dice evaluation must clear a floor — a pipeline producing well-formed
garbage (filename-pairing or normalization regressions) fails instead of
printing "E2E OK: mean dice 0.0"."""
import os, sys, tempfile, glob

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import imageio.v3 as iio

from pda.data.synthetic import make_dataset_arrays
from pda.data import ImageCollectionDataset, DualImageCollectionDataset, Loader
from pda.data.transforms import Compose, AdditiveGaussianNoise, standardize
from pda.models import ProbabilisticUnet
from pda.train import PUNetTrainer, MeanTeacherTrainer, checkpoint_dir, load_params
from pda.infer import punet_prediction, punet_pseudo_prediction
from pda.eval import run_dice_evaluation

root = tempfile.mkdtemp(prefix="pda_e2e_")
raws, labels = make_dataset_arrays(6, (64, 64), seed=0)
img_dir, lab_dir = os.path.join(root, "img"), os.path.join(root, "lab")
os.makedirs(img_dir); os.makedirs(lab_dir)
ipaths, lpaths = [], []
for i, (r, l) in enumerate(zip(raws, labels)):
    ip = os.path.join(img_dir, f"im{i}.tif"); lp = os.path.join(lab_dir, f"im{i}.tif")
    iio.imwrite(ip, r.astype(np.float32)); iio.imwrite(lp, l.astype(np.uint8))
    ipaths.append(ip); lpaths.append(lp)

model = ProbabilisticUnet(
    input_channels=1, num_classes=1, num_filters=(4, 8, 12, 16),
    latent_dim=6, no_convs_fcomb=3, beta=1.0, rl_swap=True,
)
ds = ImageCollectionDataset(ipaths, lpaths, patch_shape=(64, 64))
loader = Loader(ds, batch_size=2, num_workers=0, shuffle=True, seed=0)
save_root = os.path.join(root, "runs")
tr = PUNetTrainer(name="src", model=model, train_loader=loader,
                  val_loader=loader, save_root=save_root, learning_rate=1e-3)
tr.fit(150)  # enough steps that the dice-floor check below is meaningful
ckpt = checkpoint_dir("src", save_root)
assert os.path.exists(os.path.join(ckpt, "best.ckpt")), "best.ckpt missing"
assert os.path.exists(os.path.join(ckpt, "latest.ckpt")), "latest.ckpt missing"
assert glob.glob(os.path.join(save_root, "logs", "**", "*"), recursive=True)

# MT warm start from the source checkpoint
aug = Compose(standardize, AdditiveGaussianNoise(scale=(0.0, 0.15)))
dual = DualImageCollectionDataset(ipaths, lpaths, patch_shape=(64, 64),
                                  augmentation1=aug, augmentation2=aug)
dloader = Loader(dual, batch_size=2, num_workers=0, shuffle=True, seed=1)
dval = Loader(dual, batch_size=1, num_workers=0, shuffle=False, seed=2)
mt = MeanTeacherTrainer("mt", model=model, train_loader=dloader,
                        val_loader=dval, save_root=save_root,
                        learning_rate=1e-4, ckpt_model=ckpt, ckpt_teacher=ckpt)
mt.fit(4)
assert os.path.exists(os.path.join(checkpoint_dir("mt", save_root), "latest.ckpt"))

# tiled MC prediction from the trained source params
params = load_params(ckpt, tr.state.params)
pred_dir = os.path.join(root, "pred") + os.sep
punet_prediction(os.path.join(img_dir, "*.tif"), pred_dir, model, params,
                 prior_samples=4, block_shape=(64, 64), halo=(8, 8))
preds = sorted(glob.glob(os.path.join(pred_dir, "*.tif")))
assert len(preds) == 6, preds
p0 = iio.imread(preds[0])
assert p0.ndim == 2 and float(p0.min()) >= 0.0 and float(p0.max()) <= 1.0

# pseudo-label export trees
pseudo_root = os.path.join(root, "pseudo") + os.sep
punet_pseudo_prediction(img_dir, pseudo_root, model,
                        params, prior_samples=4, split_name="train")
ann = glob.glob(os.path.join(pseudo_root, "annotations", "**", "*.tif"),
                recursive=True)
cons = glob.glob(os.path.join(pseudo_root, "consensus", "**", "*.tif"),
                 recursive=True)
assert len(ann) == 6 and len(cons) == 6, (len(ann), len(cons))
c0 = iio.imread(cons[0])
assert set(np.unique(c0)).issubset({0, 1}), np.unique(c0)

# dice evaluation of the tiled predictions against gt — with a FLOOR: a
# pipeline that produced well-formed garbage must fail here, not print 0.0
mean = run_dice_evaluation(os.path.join(lab_dir, "*.tif"), pred_dir)
assert np.isfinite(mean), mean
DICE_FLOOR = 0.5
assert mean >= DICE_FLOOR, (
    f"e2e dice {mean:.4f} below floor {DICE_FLOOR} — the pipeline ran but "
    "did not learn/evaluate correctly (check filename pairing, "
    "normalization, checkpoint selection)"
)
print("E2E OK: mean dice", mean)
