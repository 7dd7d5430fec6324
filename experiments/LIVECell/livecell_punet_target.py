"""PUNet target self-training on LIVECell via file-mediated pseudo-labels.

TPU-native equivalent of reference LIVECell/livecell_punet_target.py — the
3-stage pipeline:
  --get_pseudo_labels  MC-16 full-image pseudo-label + consensus export from
                       every source model (reference :14-53)
  --train              56-pair PseudoTrainerPUNet on 256^2 patches bs=2 with
                       consensus weighting (:56-117)
  --predict/--evaluate tiled MC prediction + dice (:120-172)
"""

import argparse
import os
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from pda.data.builders import CELL_TYPES, get_my_livecell_loader
from pda.eval import run_dice_evaluation
from pda.experiments import livecell_punet
from pda.infer import punet_prediction, punet_pseudo_prediction
from pda.models.punet import init_params_cpu
from pda.train import (
    PseudoTrainerPUNet,
    ReduceLROnPlateau,
    checkpoint_dir,
    checkpoint_exists,
    load_params,
)


def _template():
    model = livecell_punet()
    x0 = jnp.zeros((1, 64, 64, 1))
    return model, init_params_cpu(model, x0, x0)


def do_punet_source_predictions(args):
    """Export pseudo-labels + consensus masks for every (source model, cell
    type) pair into punet_source_predictions/<src>/ (reference :14-53)."""
    model, template = _template()
    for cellname in CELL_TYPES:
        ckpt = checkpoint_dir(f"punet-source-livecell-{cellname}", args.save_root)
        if not checkpoint_exists(ckpt):
            print("The source trained model couldn't be found/hasn't been trained yet")
            continue
        params = load_params(ckpt, template)
        for cellname_ in CELL_TYPES:
            split_name = "livecell_train_val_images"
            input_path = os.path.join(args.data, "images", split_name)
            output_path = os.path.join(
                args.pred_path, "punet_source_predictions", cellname
            ) + os.sep
            punet_pseudo_prediction(
                input_path, output_path, model, params,
                prior_samples=16, cellname=cellname_, split_name=split_name,
            )


def do_punet_target_training(args, patch_shape=(256, 256)):
    for trg in CELL_TYPES:
        for src in CELL_TYPES:
            if src == trg:
                continue
            print(f"Transferring {src} learnings on {trg}")
            pseudo_label_path = os.path.join(
                args.pred_path, "punet_source_predictions", src
            )
            train_loader = get_my_livecell_loader(
                path=args.data, split="train", patch_shape=patch_shape,
                batch_size=2, cell_types=[trg], label_path=pseudo_label_path,
            )
            val_loader = get_my_livecell_loader(
                path=args.data, split="val", patch_shape=patch_shape,
                batch_size=1, cell_types=[trg], label_path=pseudo_label_path,
            )
            my_name = f"punet-livecell-source-{src}-target-{trg}"
            trainer = PseudoTrainerPUNet(
                name=my_name if not args.consensus else my_name + "-consensus",
                model=livecell_punet(consensus_masking=args.consensus),
                train_loader=train_loader,
                val_loader=val_loader,
                learning_rate=1e-5,
                lr_scheduler=ReduceLROnPlateau(factor=0.9, patience=10),
                save_root=args.save_root,
                log_image_interval=1000,
            )
            trainer.fit(args.iterations or 100_000)


def do_punet_target_predictions(args):
    model, template = _template()
    for trg in CELL_TYPES:
        for src in CELL_TYPES:
            if src == trg:
                continue
            name = f"punet-livecell-source-{src}-target-{trg}"
            if args.consensus:
                name += "-consensus"
            ckpt = checkpoint_dir(name, args.save_root)
            if not checkpoint_exists(ckpt):
                print("The model couldn't be found/hasn't been trained yet")
                continue
            params = load_params(ckpt, template)
            input_path = os.path.join(
                args.data, "images", "livecell_test_images", f"{trg}*"
            )
            output_path = os.path.join(
                args.pred_path, "punet_target", f"source-{src}-target-{trg}"
            )
            punet_prediction(input_path, output_path, model, params, prior_samples=16)


def do_punet_target_evaluations(args):
    for trg in CELL_TYPES:
        gt_path = os.path.join(
            args.data, "annotations", "livecell_test_images", trg, "*"
        )
        for src in CELL_TYPES:
            if src == trg:
                continue
            pred_dir = os.path.join(
                args.pred_path, "punet_target", f"source-{src}-target-{trg}"
            )
            if not os.path.exists(pred_dir):
                print("The predictions haven't been generated, hence no evaluation")
                continue
            run_dice_evaluation(gt_path, pred_dir)
            print(f"dice for {trg} from {src}-{trg}")


def main(args):
    if args.get_pseudo_labels:
        print("Generating pseudo labels + consensus masks from source models")
        do_punet_source_predictions(args)
    if args.train:
        print("Training PUNet on pseudo labels (target self-training)")
        do_punet_target_training(args)
    if args.predict:
        print("Getting target PUNet predictions")
        do_punet_target_predictions(args)
    if args.evaluate:
        print("Evaluating target PUNet predictions")
        do_punet_target_evaluations(args)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--get_pseudo_labels", action="store_true")
    parser.add_argument("--train", action="store_true")
    parser.add_argument("--predict", action="store_true")
    parser.add_argument("--evaluate", action="store_true")
    parser.add_argument("--consensus", action="store_true")
    parser.add_argument("--data", type=str, default="./data/livecell/")
    parser.add_argument("--pred_path", type=str, default="./predictions/livecell/")
    parser.add_argument("--save_root", type=str, default=None)
    parser.add_argument("--iterations", type=int, default=None)
    main(parser.parse_args())
