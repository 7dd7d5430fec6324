"""Supervised PUNet source models on LIVECell — one per cell type.

TPU-native equivalent of reference LIVECell/livecell_punet.py:
  --train     PUNet (filters 64..512, latent 6, fcomb 3, beta 1, dice recon),
              Adam 1e-5 + ReduceLROnPlateau(0.9, 10), 100k iters,
              512^2 patches bs=4 / val bs=1 (reference :14-78)
  --predict   tiled MC-16 mean-prob inference per source x target pair (:81-127)
  --evaluate  dice vs GT (:130-147)
"""

import argparse
import os
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from pda.data.builders import CELL_TYPES, get_livecell_loader
from pda.eval import run_dice_evaluation
from pda.experiments import livecell_punet
from pda.infer import punet_prediction
from pda.models.punet import init_params_cpu
from pda.experiments.common import mesh_from_arg
from pda.train import (
    PUNetTrainer,
    ReduceLROnPlateau,
    checkpoint_dir,
    checkpoint_exists,
    load_params,
)


def do_punet_training(args, patch_shape=(512, 512)):
    for ctype in CELL_TYPES:
        train_loader = get_livecell_loader(
            path=args.data, split="train", binary=True, patch_shape=patch_shape,
            batch_size=4, cell_types=[ctype], download=True,
        )
        val_loader = get_livecell_loader(
            path=args.data, split="val", binary=True, patch_shape=patch_shape,
            batch_size=1, cell_types=[ctype], download=True,
        )
        trainer = PUNetTrainer(
            name=f"punet-source-livecell-{ctype}",
            model=livecell_punet(),
            train_loader=train_loader,
            val_loader=val_loader,
            learning_rate=1e-5,
            lr_scheduler=ReduceLROnPlateau(factor=0.9, patience=10),
            save_root=args.save_root,
            log_image_interval=100,
            mesh=mesh_from_arg(args),
        )
        trainer.fit(args.iterations or 100_000)


def _load_source_params(name, save_root, template):
    ckpt = checkpoint_dir(name, save_root)
    if not checkpoint_exists(ckpt):
        return None
    return load_params(ckpt, template)


def do_punet_predictions(args):
    model = livecell_punet()
    x0 = jnp.zeros((1, 64, 64, 1))
    template = init_params_cpu(model, x0, x0)
    for ctype1 in CELL_TYPES:
        params = _load_source_params(
            f"punet-source-livecell-{ctype1}", args.save_root, template
        )
        if params is None:
            print("The source model couldn't be found/hasn't been trained yet")
            continue
        for ctype2 in CELL_TYPES:
            input_path = os.path.join(
                args.data, "images", "livecell_test_images", f"{ctype2}*.tif"
            )
            output_path = os.path.join(args.pred_path, "punet_source", ctype1, ctype2)
            punet_prediction(
                input_path, output_path, model, params, prior_samples=16
            )


def do_punet_evaluations(args):
    for ctype1 in CELL_TYPES:
        gt_dir = os.path.join(
            args.data, "annotations", "livecell_test_images", ctype1, "*"
        )
        for ctype2 in CELL_TYPES:
            pred_dir = os.path.join(args.pred_path, "punet_source", ctype2, ctype1)
            if not os.path.exists(pred_dir):
                print("The punet predictions couldn't be found")
                continue
            run_dice_evaluation(gt_dir, pred_dir)
            print(f"Dice for Target Cells - {ctype1} from Source Cells - {ctype2}")


def main(args):
    if args.train:
        print("Training PUNet source models on LiveCELL dataset")
        do_punet_training(args)
    if args.predict:
        print("Getting PUNet predictions on LiveCELL dataset")
        do_punet_predictions(args)
    if args.evaluate:
        print("Evaluating the PUNet predictions of LiveCELL dataset")
        do_punet_evaluations(args)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--train", action="store_true")
    parser.add_argument("--predict", action="store_true")
    parser.add_argument("--evaluate", action="store_true")
    parser.add_argument("--data", type=str, default="./data/livecell/")
    parser.add_argument("--pred_path", type=str, default="./predictions/livecell/")
    parser.add_argument("--save_root", type=str, default=None)
    parser.add_argument("--iterations", type=int, default=None)
    parser.add_argument("--mesh", type=str, default=None,
                        help="Device mesh: auto | data=N | data=N,space=M")
    main(parser.parse_args())
