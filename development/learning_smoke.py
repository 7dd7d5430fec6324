"""Learning-dynamics smoke: PUNet source training on synthetic blobs.

Trains a small PUNet on the synthetic blob dataset for a few hundred steps
and reports the validation Dice trajectory — evidence that the full stack
(data -> augment -> jitted ELBO step -> plateau scheduler -> MC validation)
learns, not merely runs. Executes on whatever backend is default (TPU under
axon; CPU with JAX_PLATFORMS=cpu).

Usage: python development/learning_smoke.py [--iterations 300]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--iterations", type=int, default=300)
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--save_root", type=str, default="/tmp/pda_smoke")
    args = parser.parse_args()

    from pda.data import ImageCollectionDataset, Loader
    from pda.data.synthetic import make_dataset_arrays
    from pda.models import ProbabilisticUnet
    from pda.train import PUNetTrainer, ReduceLROnPlateau

    raws, labels = make_dataset_arrays(32, (96, 96), seed=7)
    train_ds = ImageCollectionDataset(raws[:24], labels[:24], patch_shape=(64, 64),
                                      n_samples=args.batch * 16)
    val_ds = ImageCollectionDataset(raws[24:], labels[24:], patch_shape=(64, 64))

    model = ProbabilisticUnet(
        num_filters=(16, 32, 64, 96), latent_dim=6, no_convs_fcomb=3,
        beta=1.0, rl_swap=True,
    )
    trainer = PUNetTrainer(
        "learning-smoke", model,
        Loader(train_ds, args.batch, seed=0, num_workers=4),
        Loader(val_ds, 4, seed=1),
        learning_rate=1e-3,
        lr_scheduler=ReduceLROnPlateau(),
        save_root=args.save_root,
        logger=False,
        mixed_precision=True,
    )
    stats = trainer.fit(args.iterations)
    final = trainer.validate()
    print(
        f"iterations={stats['iterations']} "
        f"patches/sec={stats['patches_per_sec']:.2f} "
        f"final_val_dice={final['dice']:.4f}"
    )
    assert final["dice"] > 0.5, (
        f"learning smoke failed: dice {final['dice']:.3f} after "
        f"{args.iterations} steps"
    )
    print("LEARNING SMOKE PASSED")


if __name__ == "__main__":
    main()
