"""Mean-Teacher self-training smoke: warm start -> pseudo-labels -> adapt.

Exercises the complete north-star path on-device: a source PUNet checkpoint
(from development/learning_smoke.py) warm-starts student and teacher; the
teacher generates MC-16 pseudo-labels + consensus masks inside the jitted
step; the student trains on a (optionally domain-shifted) synthetic target;
ground-truth dice is reported before and after.

Measured on the v5e chip (round 1): with no shift, warm-started gt dice
0.844 -> 0.859 after 50 MT steps (MT improves on its initialization through
its own pseudo-label loop). Under heavy synthetic shifts the 300-step source
model collapses — expected behavior for self-training, not a pipeline issue.

Usage:
  python development/learning_smoke.py            # creates the source ckpt
  python development/mt_smoke.py [--contrast 0.9 --noise 0.1 --iterations 50]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--iterations", type=int, default=50)
    parser.add_argument("--contrast", type=float, default=1.0,
                        help="target-domain contrast scale")
    parser.add_argument("--noise", type=float, default=0.0,
                        help="target-domain additive-noise std")
    parser.add_argument("--save_root", type=str, default="/tmp/pda_smoke")
    args = parser.parse_args()

    from pda.data import (
        AdditiveGaussianNoise,
        Compose,
        DualImageCollectionDataset,
        Loader,
        standardize,
    )
    from pda.data.synthetic import make_dataset_arrays
    from pda.models import ProbabilisticUnet
    from pda.train import MeanTeacherTrainer, ReduceLROnPlateau

    raws, labels = make_dataset_arrays(32, (96, 96), seed=99)
    rng = np.random.default_rng(0)
    raws = [
        (args.contrast * r + args.noise * rng.standard_normal(r.shape)).astype(
            np.float32
        )
        for r in raws
    ]

    aug = Compose(standardize, AdditiveGaussianNoise(scale=(0.0, 0.15)))
    tr = DualImageCollectionDataset(
        raws[:24], labels[:24], patch_shape=(64, 64),
        augmentation1=aug, augmentation2=aug, n_samples=128,
    )
    va = DualImageCollectionDataset(
        raws[24:], labels[24:], patch_shape=(64, 64),
        augmentation1=aug, augmentation2=aug,
    )

    model = ProbabilisticUnet(
        num_filters=(16, 32, 64, 96), latent_dim=6, no_convs_fcomb=3,
        beta=1.0, rl_swap=True, consensus_masking=True,
    )
    ckpt = os.path.join(
        args.save_root, "checkpoints", "learning-smoke", "best.ckpt"
    )
    assert os.path.exists(ckpt), "run development/learning_smoke.py first"
    mt = MeanTeacherTrainer(
        "mt-smoke", model,
        Loader(tr, 8, seed=0, num_workers=4), Loader(va, 4, seed=1),
        learning_rate=1e-4, lr_scheduler=ReduceLROnPlateau(),
        save_root=args.save_root, logger=False, mixed_precision=True,
        ckpt_model=ckpt, ckpt_teacher=ckpt, do_consensus_masking=True,
    )
    mt.initialize()
    before = mt.validate()
    print(f"before MT: gt dice = {1 - before['gt_metric']:.4f}", flush=True)
    stats = mt.fit(args.iterations)
    after = mt.validate()
    print(
        f"after  MT: gt dice = {1 - after['gt_metric']:.4f} "
        f"({stats['patches_per_sec']:.2f} patches/s)",
        flush=True,
    )
    print("MT SMOKE DONE")


if __name__ == "__main__":
    main()
