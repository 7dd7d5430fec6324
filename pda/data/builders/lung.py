"""Lung X-Ray dataset loaders: jsrt1, jsrt2, nih, montgomery.

Capability twins of reference prob_utils/my_datasets/
{my_jsrt1.py, my_jsrt2.py, my_nih.py, my_montgomery.py}: glob PNG/BMP folders,
deterministic sklearn train/val split (random_state=42, test_size=0.1),
label transform ``x == 255``, two-view DualImageCollectionDataset.

Also :func:`prepare_lung_data` — the Lung-XRay/prepare_data.py equivalent:
montgomery left+right mask merge + resize to 256^2, NIH resize, 80/20
train/test split at prep time (reference Lung-XRay/prepare_data.py:36-61,
108-135).
"""

from __future__ import annotations

import os
from glob import glob
from typing import Optional, Tuple

import numpy as np

from ..datasets import DualImageCollectionDataset
from ..loader import Loader

LUNG_DOMAINS = ["jsrt1", "jsrt2", "nih", "montgomery"]


def my_label_transform(x: np.ndarray) -> np.ndarray:
    """(x == 255) -> float (reference my_jsrt1.py:10-11)."""
    return (np.asarray(x) == 255).astype("float32")


def _train_val_split(raw_paths, label_paths, split, val_fraction):
    """sklearn train_test_split(random_state=42) — the reference's exact split
    (my_jsrt1.py:28-33)."""
    from sklearn.model_selection import train_test_split

    if val_fraction > 0 and split in ("train", "val"):
        xt, xv, lt, lv = train_test_split(
            raw_paths, label_paths, random_state=42, test_size=val_fraction
        )
        return (xv, lv) if split == "val" else (xt, lt)
    return raw_paths, label_paths


def _make_loader(raw_paths, label_paths, patch_shape, batch_size,
                 augmentation1, augmentation2, num_workers=8, **kwargs):
    assert len(raw_paths) > 0, "no lung images found"
    assert len(raw_paths) == len(label_paths)
    ds = DualImageCollectionDataset(
        raw_paths,
        label_paths,
        patch_shape=patch_shape,
        label_transform=my_label_transform,
        augmentation1=augmentation1,
        augmentation2=augmentation2,
    )
    return Loader(ds, batch_size, num_workers=num_workers, **kwargs)


def get_jsrt_s1_loader(
    data_path: str, split: str, batch_size: int = 1,
    patch_shape: Tuple[int, int] = (256, 256), val_fraction: float = 0.1,
    augmentation1=None, augmentation2=None, **kwargs,
) -> Loader:
    """JSRT segmentation01 layout: <split>/org/*.png + <split>/label/*.png
    (reference my_jsrt1.py)."""
    src = "train" if split == "val" else split
    raw_paths = sorted(glob(os.path.join(data_path, src, "org", "*.png")))
    label_paths = sorted(glob(os.path.join(data_path, src, "label", "*.png")))
    raw_paths, label_paths = _train_val_split(raw_paths, label_paths, split, val_fraction)
    return _make_loader(raw_paths, label_paths, patch_shape, batch_size,
                        augmentation1, augmentation2, **kwargs)


def get_jsrt_s2_loader(
    data_path: str, split: str, batch_size: int = 1,
    patch_shape: Tuple[int, int] = (256, 256), val_fraction: float = 0.1,
    augmentation1=None, augmentation2=None, **kwargs,
) -> Loader:
    """JSRT segmentation02 layout: org_<split>/*.bmp + label_<split>/*.png
    (reference my_jsrt2.py)."""
    src = "train" if split == "val" else split
    raw_paths = sorted(glob(os.path.join(data_path, f"org_{src}", "*.bmp")))
    label_paths = sorted(glob(os.path.join(data_path, f"label_{src}", "*.png")))
    raw_paths, label_paths = _train_val_split(raw_paths, label_paths, split, val_fraction)
    return _make_loader(raw_paths, label_paths, patch_shape, batch_size,
                        augmentation1, augmentation2, **kwargs)


def _images_labels_loader(
    data_path, split, batch_size, patch_shape, val_fraction,
    augmentation1, augmentation2, **kwargs,
):
    src = "train" if split == "val" else split
    raw_paths = sorted(glob(os.path.join(data_path, "images", src, "*.png")))
    label_paths = sorted(glob(os.path.join(data_path, "labels", src, "*.png")))
    raw_paths, label_paths = _train_val_split(raw_paths, label_paths, split, val_fraction)
    return _make_loader(raw_paths, label_paths, patch_shape, batch_size,
                        augmentation1, augmentation2, **kwargs)


def get_nih_loader(
    data_path: str, split: str, batch_size: int = 1,
    patch_shape: Tuple[int, int] = (256, 256), val_fraction: float = 0.1,
    augmentation1=None, augmentation2=None, **kwargs,
) -> Loader:
    """NIH layout: images/<split>/*.png + labels/<split>/*.png (my_nih.py)."""
    return _images_labels_loader(data_path, split, batch_size, patch_shape,
                                 val_fraction, augmentation1, augmentation2, **kwargs)


def get_montgomery_loader(
    data_path: str, split: str, batch_size: int = 1,
    patch_shape: Tuple[int, int] = (256, 256), val_fraction: float = 0.1,
    augmentation1=None, augmentation2=None, **kwargs,
) -> Loader:
    """Montgomery layout: images/<split>/*.png + labels/<split>/*.png
    (my_montgomery.py)."""
    return _images_labels_loader(data_path, split, batch_size, patch_shape,
                                 val_fraction, augmentation1, augmentation2, **kwargs)


def get_lung_loader(domain: str, data_path: str, split: str, **kwargs) -> Loader:
    """Dispatch by lung domain name (reference Lung-XRay/lung_mt.py:98)."""
    factory = {
        "jsrt1": get_jsrt_s1_loader,
        "jsrt2": get_jsrt_s2_loader,
        "nih": get_nih_loader,
        "montgomery": get_montgomery_loader,
    }[domain]
    return factory(data_path, split, **kwargs)


# ---------------------------------------------------------------------------
# data preparation (Lung-XRay/prepare_data.py equivalent)
# ---------------------------------------------------------------------------


def prepare_montgomery(raw_root: str, out_root: str, size: Tuple[int, int] = (256, 256),
                       test_fraction: float = 0.2, seed: int = 42):
    """Merge left+right lung masks, resize to 256^2, random 80/20 train/test
    split (reference Lung-XRay/prepare_data.py:36-61)."""
    import cv2
    import imageio.v3 as imageio

    img_dir = os.path.join(raw_root, "CXR_png")
    left_dir = os.path.join(raw_root, "ManualMask", "leftMask")
    right_dir = os.path.join(raw_root, "ManualMask", "rightMask")
    images = sorted(glob(os.path.join(img_dir, "*.png")))
    assert images, f"no montgomery images under {img_dir}"

    rng = np.random.default_rng(seed)
    order = rng.permutation(len(images))
    n_test = int(round(test_fraction * len(images)))
    test_idx = set(order[:n_test].tolist())

    for split in ("train", "test"):
        os.makedirs(os.path.join(out_root, "images", split), exist_ok=True)
        os.makedirs(os.path.join(out_root, "labels", split), exist_ok=True)

    for i, img_path in enumerate(images):
        name = os.path.basename(img_path)
        split = "test" if i in test_idx else "train"
        img = np.asarray(imageio.imread(img_path))
        if img.ndim == 3:
            img = img[..., 0]
        left = np.asarray(imageio.imread(os.path.join(left_dir, name)))
        right = np.asarray(imageio.imread(os.path.join(right_dir, name)))
        mask = ((left > 0) | (right > 0)).astype("uint8") * 255

        # cv2 dsize is (width, height); size is (rows, cols)
        dsize = (size[1], size[0])
        img = cv2.resize(img, dsize, interpolation=cv2.INTER_AREA)
        mask = cv2.resize(mask, dsize, interpolation=cv2.INTER_NEAREST)
        imageio.imwrite(os.path.join(out_root, "images", split, name), img.astype("uint8"))
        imageio.imwrite(os.path.join(out_root, "labels", split, name), mask)


def prepare_nih(raw_root: str, out_root: str, size: Tuple[int, int] = (256, 256)):
    """Resize NIH images+masks to 256^2 keeping the provided split folders
    (reference Lung-XRay/prepare_data.py:108-135)."""
    import cv2
    import imageio.v3 as imageio

    for split in ("train", "test"):
        img_glob = glob(os.path.join(raw_root, "images", split, "*.png"))
        for img_path in img_glob:
            name = os.path.basename(img_path)
            lab_path = os.path.join(raw_root, "labels", split, name)
            img = np.asarray(imageio.imread(img_path))
            lab = np.asarray(imageio.imread(lab_path))
            if img.ndim == 3:
                img = img[..., 0]
            # cv2 dsize is (width, height); size is (rows, cols)
            img = cv2.resize(img, (size[1], size[0]), interpolation=cv2.INTER_AREA)
            lab = cv2.resize(lab, (size[1], size[0]), interpolation=cv2.INTER_NEAREST)
            os.makedirs(os.path.join(out_root, "images", split), exist_ok=True)
            os.makedirs(os.path.join(out_root, "labels", split), exist_ok=True)
            imageio.imwrite(os.path.join(out_root, "images", split, name), img.astype("uint8"))
            imageio.imwrite(os.path.join(out_root, "labels", split, name),
                            ((lab > 0) * 255).astype("uint8"))
