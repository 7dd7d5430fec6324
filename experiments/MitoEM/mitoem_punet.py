"""Supervised PUNet source model on MitoEM.

TPU-native equivalent of reference MitoEM/mitoem_punet.py:
  --train     single source model ``punet-source-mitoem`` on MitoEM volumes
              with MinForegroundSampler, 512^2 bs=4, Adam 1e-5, 100k iters
  --predict   tiled MC prediction on vnc / lucchi / urocell raw stacks
  --evaluate  dice vs each target's GT with filename remapping
"""

import os
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.dirname(__file__))

import common  # experiments/MitoEM/common.py

from pda.eval import run_dice_evaluation
from pda.experiments import livecell_punet as mitoem_punet, standard_parser
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


def do_punet_training(args):
    train_loader, val_loader = common.get_mitoem_loaders(
        os.path.join(args.data, "mitoem")
    )
    trainer = PUNetTrainer(
        name="punet-source-mitoem",
        model=mitoem_punet(),
        train_loader=train_loader,
        val_loader=val_loader,
        learning_rate=1e-5,
        lr_scheduler=ReduceLROnPlateau(factor=0.9, patience=10),
        save_root=args.save_root,
        log_image_interval=1000,
        mesh=mesh_from_arg(args),
    )
    trainer.fit(args.iterations or 100_000)


def do_punet_predictions(args, em_type: str):
    model = mitoem_punet()
    x0 = jnp.zeros((1, 64, 64, 1))
    template = init_params_cpu(model, x0, x0)
    ckpt = checkpoint_dir("punet-source-mitoem", args.save_root)
    if not checkpoint_exists(ckpt):
        print("The source model couldn't be found / hasn't been trained yet")
        return
    params = load_params(ckpt, template)
    output_path = os.path.join(args.pred_path, "punet_predictions", em_type)
    punet_prediction(
        common.em_input_glob(args.data, em_type), output_path, model, params
    )


def do_punet_evaluations(args, em_type: str):
    output_path = os.path.join(args.pred_path, "punet_predictions", em_type)
    run_dice_evaluation(
        common.em_gt_glob(args.data, em_type), output_path, subtype=em_type
    )


def main(args):
    if args.train:
        print("Training a 2D PUNet on MitoEM dataset")
        do_punet_training(args)
    if args.predict:
        print("Getting predictions on Lucchi / VNC / UroCell datasets")
        for em_type in common.EM_TYPES:
            do_punet_predictions(args, em_type)
    if args.evaluate:
        print("Evaluating the PUNet predictions")
        for em_type in common.EM_TYPES:
            do_punet_evaluations(args, em_type)


if __name__ == "__main__":
    main(standard_parser(__doc__).parse_args())
