"""Supervised UNet source model on MitoEM.

TPU-native equivalent of reference MitoEM/mitoem_unet.py: single
``unet-source-mitoem`` model (UNet2d depth 4, 64 feats, sigmoid), Adam 1e-5,
100k iters; tiled inference + dice on vnc / lucchi / urocell.
"""

import os
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.dirname(__file__))

import common

from pda.eval import run_dice_evaluation
from pda.experiments import standard_parser
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


def do_unet_training(args):
    train_loader, val_loader = common.get_mitoem_loaders(
        os.path.join(args.data, "mitoem")
    )
    trainer = UNetTrainer(
        name="unet-source-mitoem",
        model=make_model(),
        train_loader=train_loader,
        val_loader=val_loader,
        learning_rate=1e-5,
        save_root=args.save_root,
        log_image_interval=1000,
        mesh=mesh_from_arg(args),
    )
    trainer.fit(args.iterations or 100_000)


def do_unet_predictions(args, em_type: str):
    model = make_model()
    template = init_params_cpu(model, jnp.zeros((1, 64, 64, 1)))
    ckpt = checkpoint_dir("unet-source-mitoem", args.save_root)
    if not checkpoint_exists(ckpt):
        print("The source model couldn't be found / hasn't been trained yet")
        return
    params = load_params(ckpt, template)
    output_path = os.path.join(args.pred_path, "unet_predictions", em_type)
    unet_prediction(
        common.em_input_glob(args.data, em_type), output_path, model, params
    )


def main(args):
    if args.train:
        print("Training a 2D UNet on MitoEM dataset")
        do_unet_training(args)
    if args.predict:
        for em_type in common.EM_TYPES:
            do_unet_predictions(args, em_type)
    if args.evaluate:
        for em_type in common.EM_TYPES:
            output_path = os.path.join(args.pred_path, "unet_predictions", em_type)
            run_dice_evaluation(
                common.em_gt_glob(args.data, em_type), output_path, subtype=em_type
            )


if __name__ == "__main__":
    main(standard_parser(__doc__).parse_args())
