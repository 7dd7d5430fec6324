"""Shared implementation of the MitoEM -> {vnc, lucchi, urocell} DA runs.

Factors the common loop of reference MitoEM/mitoem_{mt,fm,adamt,adamatch}.py:
single source model ``punet-source-mitoem``, three targets, checkpoint names
``<method>-mito-source-mitoem-target-<em>[-consensus-*]``, prediction globs
from experiments/MitoEM/common.py. Method specifics:

  mt        MeanTeacherTrainer, weak augs on BOTH views (reference
            mitoem_mt.py:22-23), warm start, plateau patience 5, 10k iters
  fm        FixMatchTrainer, weak/strong, lr 1e-7 (mitoem_fm.py:39), 10k
  adamt     joint with mitoem source loaders, 10k
  adamatch  joint, weak/strong, 10k
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

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
    da_name,
    livecell_punet as mitoem_punet,
    mesh_from_arg,
    weak_augmentations,
)

EM_TYPES = ["vnc", "lucchi", "urocell"]

PRED_SUBDIR = {
    "mean-teacher": "mean_teacher",
    "fixmatch": "fixmatch",
    "adamt": "adamt",
    "adamatch": "adamatch",
}


def _suffix(args) -> str:
    if args.masking:
        return "-consensus-masking"
    if args.consensus:
        return "-consensus-weighting"
    return ""


def train(args, method: str, common_mod):
    from .common import mitoem_strong_augmentations

    # --type restricts joint training to one target domain (reference
    # mitoem_adamt.py:147,185-188 / mitoem_adamatch.py:147).
    em_types = EM_TYPES
    if getattr(args, "type", None):
        em_types = [args.type]
    for em_data in em_types:
        print(f"Training on {em_data} using {method}")
        name = da_name(method, "mito", "mitoem", em_data, args.consensus, args.masking)
        model = mitoem_punet(consensus_masking=args.consensus)
        sched = ReduceLROnPlateau(factor=0.9, patience=5)
        common_kw = dict(
            lr_scheduler=sched,
            save_root=args.save_root,
            log_image_interval=100,
            mesh=mesh_from_arg(args),
        )

        if method in ("mean-teacher", "fixmatch"):
            src_dir = checkpoint_dir("punet-source-mitoem", args.source_checkpoints
                                     if os.path.isabs(args.source_checkpoints or "")
                                     else args.save_root)
            if not checkpoint_exists(src_dir):
                print(
                    "The checkpoint directory couldn't be found / "
                    "source network hasn't been trained"
                )
                continue
            src_ckpt = os.path.join(src_dir, "best.ckpt")

            if method == "mean-teacher":
                # NOTE: the reference passes WEAK augs to both views here
                # (mitoem_mt.py:22-23).
                train_l, val_l = common_mod.get_dual_loaders(
                    em_data=em_data, root_input_dir=args.data,
                    weak_augs=weak_augmentations(),
                    strong_augs=weak_augmentations(),
                )
                trainer = MeanTeacherTrainer(
                    name, model, train_l, val_l,
                    learning_rate=1e-5,
                    ckpt_model=src_ckpt, ckpt_teacher=src_ckpt,
                    do_consensus_masking=args.masking, **common_kw,
                )
            else:
                train_l, val_l = common_mod.get_dual_loaders(
                    em_data=em_data, root_input_dir=args.data,
                    weak_augs=weak_augmentations(),
                    strong_augs=mitoem_strong_augmentations(),
                )
                trainer = FixMatchTrainer(
                    name, model, train_l, val_l,
                    learning_rate=1e-7,  # reference mitoem_fm.py:39
                    ckpt_model=src_ckpt,
                    do_consensus_masking=args.masking, **common_kw,
                )
        else:
            source_train, _ = common_mod.get_mitoem_loaders(
                os.path.join(args.data, "mitoem")
            )
            strong = (
                weak_augmentations()
                if method == "adamt"
                else mitoem_strong_augmentations()
            )
            tgt_train, tgt_val = common_mod.get_dual_loaders(
                em_data=em_data, root_input_dir=args.data,
                weak_augs=weak_augmentations(), strong_augs=strong,
            )
            cls = AdaMTTrainer if method == "adamt" else AdaMatchTrainer
            trainer = cls(
                name, model, source_train, tgt_train, tgt_val,
                learning_rate=1e-5,
                do_consensus_masking=args.masking, **common_kw,
            )

        trainer.fit(args.iterations or 10_000)


def predict(args, method: str, common_mod):
    use_teacher = method in ("mean-teacher", "adamt")
    model = mitoem_punet()
    x0 = jnp.zeros((1, 64, 64, 1))
    template = init_params_cpu(model, x0, x0)
    for em_type in EM_TYPES:
        name = da_name(method, "mito", "mitoem", em_type, args.consensus, args.masking)
        ckpt = checkpoint_dir(name, args.save_root)
        if not checkpoint_exists(ckpt):
            print("The model couldn't be found / hasn't been trained yet")
            continue
        params = load_params(
            ckpt, template, key="teacher_params" if use_teacher else "params"
        )
        output_path = os.path.join(
            args.pred_path, PRED_SUBDIR[method],
            f"source-mitoem-target-{em_type}{_suffix(args)}",
        )
        punet_prediction(
            common_mod.em_input_glob(args.data, em_type), output_path, model, params
        )


def evaluate(args, method: str, common_mod):
    for em_type in EM_TYPES:
        output_path = os.path.join(
            args.pred_path, PRED_SUBDIR[method],
            f"source-mitoem-target-{em_type}{_suffix(args)}",
        )
        if not os.path.exists(output_path):
            print("The predictions haven't been generated, hence no evaluation")
            continue
        run_dice_evaluation(
            common_mod.em_gt_glob(args.data, em_type), output_path, subtype=em_type
        )


def run(args, method: str, common_mod):
    if args.train:
        print(f"Training PUNet with {method} on MitoEM targets")
        train(args, method, common_mod)
    if args.predict:
        print(f"Getting {method} predictions on MitoEM targets")
        predict(args, method, common_mod)
    if args.evaluate:
        print(f"Evaluating {method} predictions")
        evaluate(args, method, common_mod)
