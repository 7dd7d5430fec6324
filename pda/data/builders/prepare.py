"""MitoEM + UroCell acquisition: download the upstream archives and convert
them to the h5 volumes the loaders expect — without torch_em/elf/nibabel.

Capability twins of the torch_em download paths the reference relies on:
  * MitoEM: ``get_mitoem_loader(..., download=True)``
    (reference MitoEM/common.py:19-46) — per sample (human/rat), a zip of
    PNG raw slices (``im/``) plus instance-segmentation TIFF slices for the
    annotated range, split train = slices [0, 400) / val = [400, 500).
    Volumes are multi-GB, so conversion STREAMS slice-by-slice into chunked
    h5 datasets (chunks = one slice) — nothing is materialized in RAM and
    the lazy dataset reads stay windowed.
  * UroCell: ``get_uro_cell_paths(download=True)``
    (reference MitoEM/prepare_data.py:48-79) — the UroCell github archive
    ships raw volumes ``data/fib1-*.nii.gz`` and mito labels
    ``mito/fib1-*.nii.gz``; each labeled volume becomes ``<name>.h5`` with
    ``raw`` + ``labels/mito``. NIfTI-1 files are parsed by a minimal local
    reader (nibabel is not available in this environment).
"""

from __future__ import annotations

import gzip
import os
import struct
from glob import glob
from typing import Optional, Sequence

import numpy as np

from .util import download_source, unzip

MITOEM_URLS = {
    "human": "https://huggingface.co/datasets/pytc/MitoEM/resolve/main/EM30-H-mito-train-val-v2.zip",
    "rat": "https://huggingface.co/datasets/pytc/MitoEM/resolve/main/EM30-R-mito-train-val-v2.zip",
}
MITOEM_TRAIN_SLICES = 400  # annotated slices [0, 400) train, [400, 500) val
MITOEM_VAL_SLICES = 100

UROCELL_URL = (
    "https://github.com/MancaZerovnikMekuc/UroCell/archive/refs/heads/master.zip"
)


# ---------------------------------------------------------------------------
# minimal NIfTI-1 reader (UroCell volumes; avoids a nibabel dependency)
# ---------------------------------------------------------------------------

_NIFTI_DTYPES = {
    2: np.uint8, 4: np.int16, 8: np.int32, 16: np.float32, 64: np.float64,
    256: np.int8, 512: np.uint16, 768: np.uint32,
}


def read_nifti(path: str) -> np.ndarray:
    """Read a (possibly gzipped) NIfTI-1 volume as a numpy array.

    Parses the fixed 348-byte header: dims, datatype, vox_offset. Returns the
    raw data array in file order (x fastest) transposed to (z, y, x) so axis 0
    iterates slices like every other volume in the framework.
    """
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rb") as f:
        header = f.read(348)
        sizeof_hdr = struct.unpack("<i", header[:4])[0]
        byte_order = "<"
        if sizeof_hdr != 348:  # try big endian
            sizeof_hdr = struct.unpack(">i", header[:4])[0]
            if sizeof_hdr != 348:
                raise ValueError(f"{path}: not a NIfTI-1 file")
            byte_order = ">"
        dim = struct.unpack(byte_order + "8h", header[40:56])
        ndim = dim[0]
        shape = tuple(dim[1 : 1 + ndim])
        datatype = struct.unpack(byte_order + "h", header[70:72])[0]
        vox_offset = int(struct.unpack(byte_order + "f", header[108:112])[0])
        if datatype not in _NIFTI_DTYPES:
            raise ValueError(f"{path}: unsupported NIfTI datatype {datatype}")
        dtype = np.dtype(_NIFTI_DTYPES[datatype]).newbyteorder(byte_order)
        f.read(max(vox_offset - 348, 0))
        count = int(np.prod(shape))
        data = np.frombuffer(f.read(count * dtype.itemsize), dtype=dtype, count=count)
    # NIfTI stores x fastest: file order is F-contiguous in (x, y, z, ...)
    vol = data.reshape(shape[::-1])  # -> (..., z, y, x) C-order
    return np.ascontiguousarray(vol)


# ---------------------------------------------------------------------------
# MitoEM
# ---------------------------------------------------------------------------


def _find_slice_dirs(root: str):
    """Locate the raw-image dir and the train/val segmentation dirs inside an
    extracted MitoEM sample (layout: im/ + mito-train-v2/ + mito-val-v2/ or
    minor variants)."""
    im_dir, seg_train, seg_val = None, None, None
    for dirpath, dirnames, filenames in os.walk(root):
        name = os.path.basename(dirpath).lower()
        has_imgs = any(f.endswith((".png", ".tif", ".tiff")) for f in filenames)
        if not has_imgs:
            continue
        if name == "im" or name.startswith("im"):
            im_dir = dirpath
        elif "train" in name:
            seg_train = dirpath
        elif "val" in name:
            seg_val = dirpath
    return im_dir, seg_train, seg_val


def _files(directory: str):
    return sorted(
        f for f in glob(os.path.join(directory, "*"))
        if f.endswith((".png", ".tif", ".tiff"))
    )


def _stream_h5(out_path: str, raw_files: Sequence[str], seg_files: Sequence[str]):
    """Write raw + labels h5 one slice at a time (multi-GB volumes)."""
    import h5py
    import imageio.v3 as imageio

    assert len(raw_files) == len(seg_files), (len(raw_files), len(seg_files))
    first_raw = np.asarray(imageio.imread(raw_files[0]))
    first_seg = np.asarray(imageio.imread(seg_files[0]))
    n = len(raw_files)
    with h5py.File(out_path, "w") as f:
        raw_ds = f.create_dataset(
            "raw", shape=(n, *first_raw.shape), dtype=first_raw.dtype,
            chunks=(1, *first_raw.shape), compression="gzip",
        )
        lab_ds = f.create_dataset(
            "labels", shape=(n, *first_seg.shape), dtype=first_seg.dtype,
            chunks=(1, *first_seg.shape), compression="gzip",
        )
        for i, (rf, sf) in enumerate(zip(raw_files, seg_files)):
            raw_ds[i] = np.asarray(imageio.imread(rf))
            lab_ds[i] = np.asarray(imageio.imread(sf))


def prepare_mitoem_sample(
    path: str, sample: str, download: bool = False, url: Optional[str] = None
):
    """Download + convert one MitoEM sample to <path>/<sample>_{train,val}.h5.

    torch_em ``get_mitoem_loader(..., download=True)`` equivalent
    (reference MitoEM/common.py:19-46)."""
    train_out = os.path.join(path, f"{sample}_train.h5")
    val_out = os.path.join(path, f"{sample}_val.h5")
    if os.path.exists(train_out) and os.path.exists(val_out):
        return train_out, val_out
    os.makedirs(path, exist_ok=True)

    extract_root = os.path.join(path, f"{sample}_raw")
    if not os.path.exists(extract_root):
        zip_path = os.path.join(path, f"{sample}.zip")
        download_source(zip_path, url or MITOEM_URLS[sample], download)
        os.makedirs(extract_root, exist_ok=True)
        unzip(zip_path, extract_root, remove=True)

    im_dir, seg_train_dir, seg_val_dir = _find_slice_dirs(extract_root)
    assert im_dir, f"no raw image dir under {extract_root}"
    assert seg_train_dir and seg_val_dir, (
        f"missing train/val segmentation dirs under {extract_root}"
    )
    raw_files = _files(im_dir)
    seg_train = _files(seg_train_dir)
    seg_val = _files(seg_val_dir)
    _stream_h5(train_out, raw_files[: len(seg_train)], seg_train)
    _stream_h5(
        val_out, raw_files[len(seg_train) : len(seg_train) + len(seg_val)], seg_val
    )
    return train_out, val_out


# ---------------------------------------------------------------------------
# UroCell
# ---------------------------------------------------------------------------


def get_uro_cell_paths(path: str, download: bool = False, target: str = "mito"):
    """Download UroCell and convert every labeled volume to h5 with
    ``raw`` + ``labels/<target>`` — the torch_em ``get_uro_cell_paths``
    surface the reference consumes (MitoEM/prepare_data.py:48-50,
    my_urocell.py:6-26). Returns the sorted h5 paths."""
    import h5py

    os.makedirs(path, exist_ok=True)
    existing = sorted(glob(os.path.join(path, "*.h5")))
    if existing:
        return existing

    extract_root = os.path.join(path, "UroCell-master")
    if not os.path.exists(extract_root):
        zip_path = os.path.join(path, "urocell.zip")
        download_source(zip_path, UROCELL_URL, download)
        unzip(zip_path, path, remove=True)
        candidates = glob(os.path.join(path, "UroCell-*"))
        assert candidates, f"unzip produced no UroCell dir under {path}"
        extract_root = candidates[0]

    raw_files = sorted(glob(os.path.join(extract_root, "data", "*.nii.gz")))
    assert raw_files, f"no raw volumes under {extract_root}/data"
    out_paths = []
    for raw_file in raw_files:
        name = os.path.basename(raw_file).replace(".nii.gz", "")
        label_file = os.path.join(extract_root, target, f"{name}.nii.gz")
        if not os.path.exists(label_file):
            continue  # only labeled volumes become datasets (torch_em parity)
        out = os.path.join(path, f"{name}.h5")
        raw = read_nifti(raw_file)
        labels = read_nifti(label_file)
        assert raw.shape == labels.shape, (raw.shape, labels.shape)
        with h5py.File(out, "w") as f:
            f.create_dataset("raw", data=raw, compression="gzip",
                             chunks=(1, *raw.shape[1:]))
            f.create_dataset(f"labels/{target}", data=labels, compression="gzip",
                             chunks=(1, *labels.shape[1:]))
        out_paths.append(out)
    assert out_paths, f"no labeled UroCell volumes found under {extract_root}"
    return sorted(out_paths)


def prepare_urocell_slices(path: str, download: bool = False):
    """Reference MitoEM/prepare_data.py:48-79: hold out the LAST volume and
    export its foreground-containing slices as TIFF image/gt pairs for
    prediction + evaluation."""
    import imageio.v3 as imageio

    paths = get_uro_cell_paths(os.path.join(path, "urocell"), download)
    vol_path = sorted(paths)[-1]
    base_dir = os.path.join(path, "urocell", "preprocessed")
    os.makedirs(base_dir, exist_ok=True)

    import h5py

    with h5py.File(vol_path, "r") as f:
        raw = f["raw"][:]
        labels = f["labels/mito"][:]
    counter = 0
    for r, l in zip(raw, labels):
        if len(np.unique(l)) > 1:
            binary = (l > 0).astype("uint8")
            imageio.imwrite(os.path.join(base_dir, f"{counter:05}_image.tif"), r)
            imageio.imwrite(os.path.join(base_dir, f"{counter:05}_gt.tif"), binary)
            counter += 1
    return base_dir
