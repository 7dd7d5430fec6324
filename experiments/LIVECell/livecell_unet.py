"""Supervised UNet source models on LIVECell — one per cell type.

TPU-native equivalent of reference LIVECell/livecell_unet.py:
  --train     UNet2d(depth=4, initial_features=64, sigmoid), dice loss,
              Adam 1e-4, 100k iters, 256^2 patches bs=4 (reference :14-59)
  --predict   tiled inference on every source x target pair (:62-87)
  --evaluate  dice vs GT annotations (:90-104)
"""

import argparse
import os
import sys
from glob import glob

import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from pda.data.builders import CELL_TYPES, get_livecell_loader
from pda.eval import run_dice_evaluation
from pda.infer import unet_prediction
from pda.models import UNet2d
from pda.models.punet import init_params_cpu
from pda.experiments.common import mesh_from_arg
from pda.train import UNetTrainer, checkpoint_dir, checkpoint_exists, load_params


def make_model():
    return UNet2d(
        in_channels=1, out_channels=1, final_activation="sigmoid",
        depth=4, initial_features=64,
    )


def do_unet_training(args, patch_shape=(256, 256)):
    for ctype in CELL_TYPES:
        train_loader = get_livecell_loader(
            path=args.data, split="train", binary=True, patch_shape=patch_shape,
            batch_size=4, cell_types=[ctype], download=True,
        )
        val_loader = get_livecell_loader(
            path=args.data, split="val", binary=True, patch_shape=patch_shape,
            batch_size=1, cell_types=[ctype], download=True,
        )
        trainer = UNetTrainer(
            name=f"unet-source-livecell-{ctype}",
            model=make_model(),
            train_loader=train_loader,
            val_loader=val_loader,
            learning_rate=1e-4,
            save_root=args.save_root,
            log_image_interval=1000,
            mesh=mesh_from_arg(args),
        )
        trainer.fit(args.iterations or 100_000)


def do_unet_predictions(args):
    model = make_model()
    import jax

    template = init_params_cpu(model, jnp.zeros((1, 64, 64, 1)))
    for ctype1 in CELL_TYPES:
        ckpt = checkpoint_dir(f"unet-source-livecell-{ctype1}", args.save_root)
        if not checkpoint_exists(ckpt):
            print("The source model couldn't be found/hasn't been trained yet")
            continue
        params = load_params(ckpt, template)
        for ctype2 in CELL_TYPES:
            input_path = os.path.join(
                args.data, "images", "livecell_test_images", f"{ctype2}*.tif"
            )
            output_path = os.path.join(args.pred_path, "unet_source", ctype1, ctype2)
            unet_prediction(input_path, output_path, model, params)


def do_unet_evaluations(args):
    for ctype1 in CELL_TYPES:
        gt_dir = os.path.join(
            args.data, "annotations", "livecell_test_images", ctype1, "*"
        )
        for ctype2 in CELL_TYPES:
            pred_dir = os.path.join(args.pred_path, "unet_source", ctype2, ctype1)
            if not os.path.exists(pred_dir):
                print("The source model predictions couldn't be found")
                continue
            run_dice_evaluation(gt_dir, pred_dir)
            print(f"Dice for Target Cells - {ctype1} from Source Cells - {ctype2}")


def main(args):
    if args.train:
        print("Training a 2D UNet on LiveCELL dataset")
        do_unet_training(args)
    if args.predict:
        print("Getting predictions on LiveCELL dataset from the trained UNet")
        do_unet_predictions(args)
    if args.evaluate:
        print("Evaluating the UNet predictions of LiveCELL dataset")
        do_unet_evaluations(args)


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
