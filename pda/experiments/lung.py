"""Shared implementation of the Lung X-Ray experiment suite.

Factors the common pieces of reference Lung-XRay/lung_{unet,punet,mt,adamt}.py:
per-domain loaders (reference lung_punet.py:14-49), test-image/GT globs
(lung_unet.py:106-136, lung_mt.py:195-229) and the 4x3 DA loop. Lung PUNets
use BCE reconstruction (``rl_swap=False``, lung_punet.py:61).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from ..data.builders import get_lung_loader
from ..models.punet import init_params_cpu
from ..eval import run_lung_dice_evaluation
from ..infer import punet_prediction
from ..train import (
    AdaMTTrainer,
    MeanTeacherTrainer,
    ReduceLROnPlateau,
    checkpoint_dir,
    checkpoint_exists,
    load_params,
)
from .common import (
    da_name,
    lung_data_path,
    lung_punet,
    mesh_from_arg,
    weak_augmentations,
)

LUNG_DOMAINS = ["jsrt1", "jsrt2", "nih", "montgomery"]


def get_lung_loaders(domain: str, root: str, augs=None, batch_train=2):
    """Train/val loader pair for one domain (reference lung_punet.py:14-49;
    dual two-view when augs given, lung_mt.py:29-60)."""
    kwargs = {}
    if augs is not None:
        kwargs = {"augmentation1": augs, "augmentation2": augs}
    train = get_lung_loader(
        domain, lung_data_path(root, domain), "train", batch_size=batch_train, **kwargs
    )
    val = get_lung_loader(
        domain, lung_data_path(root, domain), "val", batch_size=1, **kwargs
    )
    return train, val


def test_image_glob(root: str, domain: str) -> str:
    return {
        "jsrt1": os.path.join(root, "jsrt1", "test", "org", "*"),
        "jsrt2": os.path.join(root, "jsrt2", "org_test", "*"),
        "nih": os.path.join(root, "nih_processed", "images", "test", "*"),
        "montgomery": os.path.join(root, "montgomery_processed", "images", "test", "*"),
    }[domain]


def test_gt_dir(root: str, domain: str) -> str:
    return {
        "jsrt1": os.path.join(root, "jsrt1", "test", "label") + os.sep,
        "jsrt2": os.path.join(root, "jsrt2", "label_test") + os.sep,
        "nih": os.path.join(root, "nih_processed", "labels", "test") + os.sep,
        "montgomery": os.path.join(root, "montgomery_processed", "labels", "test") + os.sep,
    }[domain]


def punet_template():
    model = lung_punet()
    x0 = jnp.zeros((1, 64, 64, 1))
    return model, init_params_cpu(model, x0, x0)


def da_train(args, method: str):
    """4x3 cross-domain self-training (reference lung_mt.py:63-155,
    lung_adamt.py)."""
    for trg in LUNG_DOMAINS:
        for src in LUNG_DOMAINS:
            if src == trg:
                continue
            print(f"Transferring {src} learnings on {trg} using {method}")
            name = da_name(method, "lung", src, trg, args.consensus, args.masking)
            model = lung_punet(consensus_masking=args.consensus)
            sched = ReduceLROnPlateau(factor=0.9, patience=10)
            augs = weak_augmentations()

            if method == "mean-teacher":
                src_dir = checkpoint_dir(f"punet-source-lung-{src}", args.save_root)
                if not checkpoint_exists(src_dir):
                    print("The source checkpoint couldn't be found")
                    continue
                src_ckpt = os.path.join(src_dir, "best.ckpt")
                train_l, val_l = get_lung_loaders(trg, args.data, augs=augs)
                trainer = MeanTeacherTrainer(
                    name, model, train_l, val_l,
                    learning_rate=1e-5, lr_scheduler=sched,
                    save_root=args.save_root, log_image_interval=10,
                    ckpt_model=src_ckpt, ckpt_teacher=src_ckpt,
                    do_consensus_masking=args.masking,
                    mesh=mesh_from_arg(args),
                )
                iters = 10_000
            elif method == "adamt":
                src_train, _ = get_lung_loaders(src, args.data)
                tgt_train, tgt_val = get_lung_loaders(trg, args.data, augs=augs)
                trainer = AdaMTTrainer(
                    name, model, src_train, tgt_train, tgt_val,
                    learning_rate=1e-5, lr_scheduler=sched,
                    save_root=args.save_root, log_image_interval=10,
                    do_consensus_masking=args.masking,
                    mesh=mesh_from_arg(args),
                )
                iters = 100_000
            else:
                raise ValueError(method)
            trainer.fit(args.iterations or iters)


def da_predict(args, method: str):
    use_teacher = method in ("mean-teacher", "adamt")
    model, template = punet_template()
    subdir = "mean_teacher" if method == "mean-teacher" else method
    for src in LUNG_DOMAINS:
        for trg in LUNG_DOMAINS:
            if src == trg:
                continue
            name = da_name(method, "lung", src, trg, args.consensus, args.masking)
            ckpt = checkpoint_dir(name, args.save_root)
            if not checkpoint_exists(ckpt):
                print("The model couldn't be found/hasn't been trained yet")
                continue
            params = load_params(
                ckpt, template, key="teacher_params" if use_teacher else "params"
            )
            output_path = os.path.join(
                args.pred_path, subdir, f"source-{src}-target-{trg}"
            )
            punet_prediction(
                test_image_glob(args.data, trg), output_path, model, params,
                prior_samples=16,
            )


def da_evaluate(args, method: str):
    subdir = "mean_teacher" if method == "mean-teacher" else method
    for src in LUNG_DOMAINS:
        for trg in LUNG_DOMAINS:
            if src == trg:
                continue
            pred_dir = os.path.join(
                args.pred_path, subdir, f"source-{src}-target-{trg}"
            ) + os.sep
            if not os.path.exists(pred_dir):
                print("The predictions couldn't be found/haven't been generated")
                continue
            run_lung_dice_evaluation(
                test_gt_dir(args.data, trg), pred_dir, lung_domain=trg
            )
            print(f"Dice on {trg} from {src}")


def da_run(args, method: str):
    if args.train:
        print(f"Training PUNet with {method} on Lung X-Ray datasets")
        da_train(args, method)
    if args.predict:
        print(f"Getting {method} predictions on Lung X-Ray datasets")
        da_predict(args, method)
    if args.evaluate:
        print(f"Evaluating {method} predictions")
        da_evaluate(args, method)
