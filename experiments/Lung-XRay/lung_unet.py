"""Supervised UNet source models on Lung X-Ray — one per domain.

TPU-native equivalent of reference Lung-XRay/lung_unet.py: per-domain
UNet2d training (dice loss, Adam 1e-5, 100k iters), padded/tiled inference
over the 4x4 source x target matrix, lung dice evaluation.
"""

import os
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from pda.eval import run_lung_dice_evaluation
from pda.experiments import standard_parser
from pda.experiments.lung import (
    LUNG_DOMAINS,
    get_lung_loaders,
    test_gt_dir,
    test_image_glob,
)
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
    for domain in LUNG_DOMAINS:
        train_loader, val_loader = get_lung_loaders(domain, args.data)
        trainer = UNetTrainer(
            name=f"unet-source-lung-{domain}",
            model=make_model(),
            train_loader=train_loader,
            val_loader=val_loader,
            learning_rate=1e-5,
            save_root=args.save_root,
            log_image_interval=100,
            mesh=mesh_from_arg(args),
        )
        trainer.fit(args.iterations or 100_000)


def do_unet_predictions(args):
    model = make_model()
    template = init_params_cpu(model, jnp.zeros((1, 64, 64, 1)))
    for src in LUNG_DOMAINS:
        ckpt = checkpoint_dir(f"unet-source-lung-{src}", args.save_root)
        if not checkpoint_exists(ckpt):
            print("The source model couldn't be found/hasn't been trained yet")
            continue
        params = load_params(ckpt, template)
        for trg in LUNG_DOMAINS:
            output_path = os.path.join(
                args.pred_path, "unet_source", f"source-{src}-target-{trg}"
            )
            unet_prediction(
                test_image_glob(args.data, trg), output_path, model, params
            )


def do_unet_evaluations(args):
    for src in LUNG_DOMAINS:
        for trg in LUNG_DOMAINS:
            pred_dir = os.path.join(
                args.pred_path, "unet_source", f"source-{src}-target-{trg}"
            ) + os.sep
            if not os.path.exists(pred_dir):
                print("The source model predictions couldn't be found")
                continue
            run_lung_dice_evaluation(test_gt_dir(args.data, trg), pred_dir, trg)
            print(f"Dice on {trg} from {src}")


def main(args):
    if args.train:
        print("Training 2D UNet on Lung X-Ray datasets")
        do_unet_training(args)
    if args.predict:
        print("Getting predictions on Lung X-Ray datasets from the trained UNet")
        do_unet_predictions(args)
    if args.evaluate:
        print("Evaluating the UNet predictions of Lung X-Ray datasets")
        do_unet_evaluations(args)


if __name__ == "__main__":
    main(standard_parser(__doc__).parse_args())
