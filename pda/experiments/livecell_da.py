"""Shared implementation of the four LIVECell domain-adaptation experiments.

The reference scripts livecell_{mt,fm,adamt,adamatch}.py differ only in the
trainer class, augmentation recipe, iteration budget and which parameter set
predicts; this module factors the common 8x7 cross-cell-type loop. The thin
scripts in experiments/LIVECell/ call :func:`run` with their method name.

Method table (reference file -> config):
  mt       MeanTeacherTrainer, weak/weak augs 512^2 bs2, 10k iters, warm-start
           student+teacher from source ckpt, predict with teacher_params
           (livecell_mt.py)
  fm       FixMatchTrainer, weak/strong(p=.9) augs 512^2 bs2, 10k iters,
           warm-start student, optional distribution alignment from exported
           source pseudo-labels, predict with params (livecell_fm.py)
  adamt    AdaMTTrainer joint training, source sup loader 256^2 bs2 + target
           weak/weak dual, 100k iters, predict with teacher_params
           (livecell_adamt.py)
  adamatch AdaMatchTrainer joint, weak/strong(p=.5), 100k iters, predict with
           params (livecell_adamatch.py)
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from ..data.builders import (
    CELL_TYPES,
    compute_class_distribution,
    get_dual_livecell_loader,
    get_livecell_loader,
)
from ..eval import run_dice_evaluation
from ..models.punet import init_params_cpu
from ..infer import punet_prediction
from ..train import (
    AdaMatchTrainer,
    AdaMTTrainer,
    FixMatchTrainer,
    MeanTeacherTrainer,
    ReduceLROnPlateau,
    checkpoint_dir,
    checkpoint_exists,
    load_params,
)
from .common import (
    adamatch_strong_augmentations,
    da_name,
    fm_strong_augmentations,
    livecell_punet,
    mesh_from_arg,
    weak_augmentations,
)

PRED_SUBDIR = {
    "mean-teacher": "mean_teacher",
    "fixmatch": "fixmatch",
    "adamt": "adamt",
    "adamatch": "adamatch",
}


def _dual_loaders(data_path, ctype, patch_shape, aug1, aug2):
    train = get_dual_livecell_loader(
        path=data_path, binary=True, split="train", patch_shape=patch_shape,
        batch_size=2, cell_types=[ctype], augmentation1=aug1, augmentation2=aug2,
        download=True,
    )
    val = get_dual_livecell_loader(
        path=data_path, binary=True, split="val", patch_shape=patch_shape,
        batch_size=1, cell_types=[ctype], augmentation1=aug1, augmentation2=aug2,
        download=True,
    )
    return train, val


def train(args, method: str):
    for trg in CELL_TYPES:
        for src in CELL_TYPES:
            if src == trg:
                continue
            print(f"Transferring {src} network learnings on {trg} using {method}")
            name = da_name(method, "livecell", src, trg, args.consensus, args.masking)
            model = livecell_punet(consensus_masking=args.consensus)
            sched = ReduceLROnPlateau(factor=0.9, patience=10)
            common = dict(
                learning_rate=1e-5,
                lr_scheduler=sched,
                save_root=args.save_root,
                log_image_interval=10,
                mesh=mesh_from_arg(args),
            )

            if method in ("mean-teacher", "fixmatch"):
                src_ckpt_dir = checkpoint_dir(
                    f"punet-source-livecell-{src}", args.save_root
                )
                if not checkpoint_exists(src_ckpt_dir):
                    print(
                        "The checkpoint directory couldn't be found/"
                        "source network hasn't been trained"
                    )
                    continue
                src_ckpt = os.path.join(src_ckpt_dir, "best.ckpt")

                if method == "mean-teacher":
                    weak = weak_augmentations()
                    train_l, val_l = _dual_loaders(
                        args.data, trg, (512, 512), weak, weak
                    )
                    trainer = MeanTeacherTrainer(
                        name, model, train_l, val_l,
                        ckpt_model=src_ckpt, ckpt_teacher=src_ckpt,
                        do_consensus_masking=args.masking, **common,
                    )
                    iters = 10_000
                else:
                    train_l, val_l = _dual_loaders(
                        args.data, trg, (512, 512),
                        weak_augmentations(), fm_strong_augmentations(),
                    )
                    src_dist = None
                    if getattr(args, "distribution_alignment", True):
                        pred_folder = os.path.join(
                            args.pred_path, "punet_source_predictions", src,
                            "annotations", "livecell_train_val_images", trg,
                        )
                        if os.path.exists(pred_folder):
                            src_dist = compute_class_distribution(pred_folder)
                        else:
                            print(f"no source pseudo-labels at {pred_folder}; "
                                  "training without distribution alignment")
                    trainer = FixMatchTrainer(
                        name, model, train_l, val_l,
                        ckpt_model=src_ckpt,
                        source_distribution=src_dist,
                        do_consensus_masking=args.masking, **common,
                    )
                    iters = 10_000
            else:
                source_train = get_livecell_loader(
                    path=args.data, split="train", binary=True,
                    patch_shape=(256, 256), batch_size=2, cell_types=[src],
                    download=True,
                )
                if method == "adamt":
                    weak = weak_augmentations()
                    tgt_train, tgt_val = _dual_loaders(
                        args.data, trg, (256, 256), weak, weak
                    )
                    trainer = AdaMTTrainer(
                        name, model, source_train, tgt_train, tgt_val,
                        do_consensus_masking=args.masking, **common,
                    )
                else:
                    tgt_train, tgt_val = _dual_loaders(
                        args.data, trg, (256, 256),
                        weak_augmentations(), adamatch_strong_augmentations(),
                    )
                    trainer = AdaMatchTrainer(
                        name, model, source_train, tgt_train, tgt_val,
                        do_consensus_masking=args.masking, **common,
                    )
                iters = 100_000

            trainer.fit(args.iterations or iters)


def predict(args, method: str):
    use_teacher = method in ("mean-teacher", "adamt")
    model = livecell_punet()
    x0 = jnp.zeros((1, 64, 64, 1))
    template = init_params_cpu(model, x0, x0)
    for trg in CELL_TYPES:
        for src in CELL_TYPES:
            if src == trg:
                continue
            name = da_name(method, "livecell", src, trg, args.consensus, args.masking)
            ckpt = checkpoint_dir(name, args.save_root)
            if not checkpoint_exists(ckpt):
                print("The model couldn't be found/hasn't been trained yet")
                continue
            params = load_params(
                ckpt, template, key="teacher_params" if use_teacher else "params"
            )
            input_path = os.path.join(
                args.data, "images", "livecell_test_images", f"{trg}*"
            )
            output_path = os.path.join(
                args.pred_path, PRED_SUBDIR[method], f"source-{src}-target-{trg}"
            )
            punet_prediction(input_path, output_path, model, params, prior_samples=16)


def evaluate(args, method: str):
    for trg in CELL_TYPES:
        gt_path = os.path.join(
            args.data, "annotations", "livecell_test_images", trg, "*"
        )
        for src in CELL_TYPES:
            if src == trg:
                continue
            pred_dir = os.path.join(
                args.pred_path, PRED_SUBDIR[method], f"source-{src}-target-{trg}"
            )
            if not os.path.exists(pred_dir):
                print("The model predictions haven't been generated, hence no evaluation")
                continue
            run_dice_evaluation(gt_path, pred_dir)
            print(f"dice for {trg} from {src}-{trg}")


def run(args, method: str):
    if args.train:
        print(f"Training PUNet with {method} on LiveCELL dataset")
        train(args, method)
    if args.predict:
        print(f"Getting {method} predictions on LiveCELL dataset")
        predict(args, method)
    if args.evaluate:
        print(f"Evaluating {method} predictions of LiveCELL dataset")
        evaluate(args, method)
