"""Supervised PUNet source models on Lung X-Ray — one per domain.

TPU-native equivalent of reference Lung-XRay/lung_punet.py: per-domain PUNet
with BCE reconstruction (``rl_swap=False``, reference :61), Adam 1e-5 +
plateau scheduler, 100k iters; tiled MC-16 inference + lung dice.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from pda.eval import run_lung_dice_evaluation
from pda.experiments import lung_punet, standard_parser
from pda.experiments.lung import (
    LUNG_DOMAINS,
    get_lung_loaders,
    punet_template,
    test_gt_dir,
    test_image_glob,
)
from pda.infer import punet_prediction
from pda.experiments.common import mesh_from_arg
from pda.train import (
    PUNetTrainer,
    ReduceLROnPlateau,
    checkpoint_dir,
    checkpoint_exists,
    load_params,
)


def do_punet_training(args):
    for domain in LUNG_DOMAINS:
        train_loader, val_loader = get_lung_loaders(domain, args.data)
        trainer = PUNetTrainer(
            name=f"punet-source-lung-{domain}",
            model=lung_punet(),
            train_loader=train_loader,
            val_loader=val_loader,
            learning_rate=1e-5,
            lr_scheduler=ReduceLROnPlateau(factor=0.9, patience=10),
            save_root=args.save_root,
            log_image_interval=100,
            mesh=mesh_from_arg(args),
        )
        trainer.fit(args.iterations or 100_000)


def do_punet_predictions(args):
    model, template = punet_template()
    for src in LUNG_DOMAINS:
        ckpt = checkpoint_dir(f"punet-source-lung-{src}", args.save_root)
        if not checkpoint_exists(ckpt):
            print("The source model couldn't be found/hasn't been trained yet")
            continue
        params = load_params(ckpt, template)
        for trg in LUNG_DOMAINS:
            output_path = os.path.join(
                args.pred_path, "punet_source", f"source-{src}-target-{trg}"
            )
            punet_prediction(
                test_image_glob(args.data, trg), output_path, model, params,
                prior_samples=16,
            )


def do_punet_evaluations(args):
    for src in LUNG_DOMAINS:
        for trg in LUNG_DOMAINS:
            pred_dir = os.path.join(
                args.pred_path, "punet_source", f"source-{src}-target-{trg}"
            ) + os.sep
            if not os.path.exists(pred_dir):
                print("The punet predictions couldn't be found")
                continue
            run_lung_dice_evaluation(test_gt_dir(args.data, trg), pred_dir, trg)
            print(f"Dice on {trg} from {src}")


def main(args):
    if args.train:
        print("Training PUNet source models on Lung X-Ray datasets")
        do_punet_training(args)
    if args.predict:
        print("Getting PUNet predictions on Lung X-Ray datasets")
        do_punet_predictions(args)
    if args.evaluate:
        print("Evaluating the PUNet predictions")
        do_punet_evaluations(args)


if __name__ == "__main__":
    main(standard_parser(__doc__).parse_args())
