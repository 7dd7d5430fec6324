"""Patch datasets: random crops + rejection sampling + two-view augmentation.

TPU-native re-design of reference prob_utils/my_datasets/
{my_image_collection_dataset.py, my_raw_image_collection_dataset.py,
my_segmentation_datasets.py} and the torch_em dataset plumbing they lean on
(SURVEY.md sections 2.6, 2.9):

  ImageCollectionDataset        -> (x, y) or (x, y, consensus)
  DualImageCollectionDataset    -> (x, aug1(x), aug2(x), y)
  DualRawImageCollectionDataset -> (x, aug1(x), aug2(x), dummy_y)   (unlabeled)
  SegmentationDataset (+Dual)   -> H5-volume random crops (2D slices from 3D)

Differences by design:
  * output layout is (H, W, C) float32 — batches stack to NHWC, the TPU
    layout, instead of torch's CHW;
  * randomness is an explicit ``numpy.random.Generator`` handed in per sample
    (``sample(index, rng)``) so multi-worker loading stays deterministic
    (SURVEY.md section 7 "Randomness discipline");
  * the rejection loop (max 500 attempts, reference
    my_image_collection_dataset.py:142-150) re-slices ALL arrays including the
    consensus mask (the reference forgets the consensus patch — a bug we do
    not reproduce);
  * inputs may be file paths OR in-memory numpy arrays (synthetic tests /
    benchmarks feed arrays directly).
"""

from __future__ import annotations

import os
from contextlib import contextmanager
from typing import Callable, Optional, Sequence, Tuple, Union

import numpy as np

from .transforms import get_augmentations, standardize

ArrayOrPath = Union[str, np.ndarray]

MAX_SAMPLING_ATTEMPTS = 500  # reference my_image_collection_dataset.py:14

class _LabelTransform2Mixin:
    """Shared post-augmentation label transform (torch_em
    ``label_transform2``, reference my_image_collection_dataset.py:176-178):
    direction-sensitive targets (affinities + validity masks) must see the
    AUGMENTED geometry, not the pre-flip/rotation one. Datasets set
    ``self.label_transform2`` (or None) in their constructors."""

    label_transform2 = None

    def _apply_label_transform2(self, labels):
        if self.label_transform2 is None:
            return labels
        return np.asarray(
            self.label_transform2(np.squeeze(labels)), dtype=np.float32
        )



def load_image(path_or_array: ArrayOrPath) -> np.ndarray:
    if isinstance(path_or_array, np.ndarray):
        return path_or_array
    import imageio.v3 as imageio

    return np.asarray(imageio.imread(path_or_array))


def _ensure_hwc(x: np.ndarray, dtype=np.float32) -> np.ndarray:
    """(H, W) -> (H, W, 1); channel-first 3D -> channel-last (heuristic:
    an axis of length < 16 is the channel axis, reference
    my_image_collection_dataset.py:126-134)."""
    x = np.asarray(x)
    if x.ndim == 2:
        x = x[..., None]
    elif x.ndim == 3 and x.shape[-1] >= 16 and x.shape[0] < 16:
        x = np.moveaxis(x, 0, -1)
    return np.ascontiguousarray(x, dtype=dtype)


class MinForegroundSampler:
    """Reject patches whose label foreground fraction is below a minimum —
    torch_em ``MinForegroundSampler`` equivalent
    (reference MitoEM/common.py:24,42: min_fraction=0.05)."""

    def __init__(self, min_fraction: float, background_id: int = 0):
        self.min_fraction = min_fraction
        self.background_id = background_id

    def __call__(self, raw: np.ndarray, labels: np.ndarray) -> bool:
        fg = np.mean(labels != self.background_id)
        return fg > self.min_fraction


class _PatchDatasetBase(_LabelTransform2Mixin):
    """Random-crop machinery shared by all patch datasets."""

    def __init__(
        self,
        patch_shape: Tuple[int, int],
        *,
        n_samples: Optional[int] = None,
        n_images: int = 0,
        sampler: Optional[Callable] = None,
        seed: int = 0,
    ):
        assert len(patch_shape) == 2
        self.patch_shape = tuple(patch_shape)
        self.sampler = sampler
        self.seed = seed
        self.sample_random_index = n_samples is not None
        self._len = n_samples if n_samples is not None else n_images
        from collections import OrderedDict

        self._cache: "OrderedDict" = OrderedDict()
        #: decode-cache bound (images, LRU). LIVECell-scale splits hold
        #: thousands of frames; an unbounded cache pins them all in every
        #: worker process. Override with PDA_IMAGE_CACHE (0 disables).
        self._cache_max = int(os.environ.get("PDA_IMAGE_CACHE", "256"))

    def _load(self, item) -> np.ndarray:
        """Path-or-array image access with a per-dataset bounded LRU cache."""
        if isinstance(item, np.ndarray):
            return item
        cached = self._cache.get(item)
        if cached is not None:
            self._cache.move_to_end(item)
            return cached
        img = load_image(item)
        if self._cache_max > 0:
            self._cache[item] = img
            while len(self._cache) > self._cache_max:
                self._cache.popitem(last=False)
        return img

    def __len__(self) -> int:
        return self._len

    @property
    def ndim(self) -> int:
        return 2

    def _bounding_box(self, shape, rng: np.random.Generator):
        if any(sh < psh for sh, psh in zip(shape, self.patch_shape)):
            raise ValueError(
                f"Image shape {shape} smaller than patch shape {self.patch_shape}"
            )
        # endpoint=True: the maximal start (sh - psh) is drawable, so the
        # last row/column of every image can appear in a patch (the
        # reference's np.random.randint high is exclusive and permanently
        # blind to the image's bottom/right edge — bug not reproduced)
        starts = [
            int(rng.integers(0, sh - psh, endpoint=True)) if sh - psh > 0 else 0
            for sh, psh in zip(shape, self.patch_shape)
        ]
        return tuple(
            slice(s, s + p) for s, p in zip(starts, self.patch_shape)
        )

    def _crop_with_rejection(self, arrays: Sequence[np.ndarray], rng):
        """Crop the same random window from every array; re-draw while the
        sampler rejects (raw, label) — max 500 attempts."""
        shape = arrays[0].shape[:2]
        if self.sampler is not None and len(arrays) < 2:
            raise ValueError(
                "sampler-based patch rejection needs (raw, labels) pairs; "
                "this dataset yields raw-only samples — drop the sampler"
            )
        for _ in range(MAX_SAMPLING_ATTEMPTS):
            bb = self._bounding_box(shape, rng)
            patches = [np.array(a[bb]) for a in arrays]
            if self.sampler is None or self.sampler(patches[0], patches[1]):
                return patches
        raise RuntimeError(
            f"Could not sample a valid patch in {MAX_SAMPLING_ATTEMPTS} attempts"
        )

    def _rng_for(self, index: int) -> np.random.Generator:
        return np.random.default_rng((self.seed, index))

    def sample(self, index: int, rng: np.random.Generator):
        raise NotImplementedError

    def __getitem__(self, index: int):
        return self.sample(index, self._rng_for(index))


class ImageCollectionDataset(_PatchDatasetBase):
    """(raw, label[, consensus]) random crops — reference
    my_image_collection_dataset.py:13-183."""

    def __init__(
        self,
        raw_images: Sequence[ArrayOrPath],
        label_images: Sequence[ArrayOrPath],
        consensus_masks: Optional[Sequence[ArrayOrPath]] = None,
        *,
        patch_shape: Tuple[int, int],
        raw_transform: Optional[Callable] = standardize,
        label_transform: Optional[Callable] = None,
        label_transform2: Optional[Callable] = None,
        transform: Optional[Callable] = None,
        n_samples: Optional[int] = None,
        sampler: Optional[Callable] = None,
        seed: int = 0,
    ):
        if len(raw_images) != len(label_images):
            raise ValueError(
                f"Expect same number of raw and label images, got "
                f"{len(raw_images)} and {len(label_images)}"
            )
        if consensus_masks is not None:
            assert len(consensus_masks) == len(raw_images)
        super().__init__(
            patch_shape,
            n_samples=n_samples,
            n_images=len(raw_images),
            sampler=sampler,
            seed=seed,
        )
        self.raw_images = list(raw_images)
        self.label_images = list(label_images)
        self.consensus_masks = list(consensus_masks) if consensus_masks else None
        self.raw_transform = raw_transform
        self.label_transform = label_transform
        self.label_transform2 = label_transform2
        self.transform = transform if transform is not None else get_augmentations(2)

    def sample(self, index: int, rng: np.random.Generator):
        if self.sample_random_index:
            index = int(rng.integers(0, len(self.raw_images)))
        index = index % len(self.raw_images)
        arrays = [self._load(self.raw_images[index]), self._load(self.label_images[index])]
        if self.consensus_masks is not None:
            arrays.append(self._load(self.consensus_masks[index]))
        patches = self._crop_with_rejection(arrays, rng)

        raw, labels = patches[0].astype(np.float32), patches[1]
        consensus = patches[2] if len(patches) == 3 else None

        if self.label_transform is not None:
            labels = self.label_transform(labels)
        labels = np.asarray(labels, dtype=np.float32)

        if self.transform is not None:
            joined = [raw, labels] + ([consensus] if consensus is not None else [])
            out = self.transform(joined, rng)
            raw, labels = out[0], out[1]
            consensus = out[2] if consensus is not None else None

        labels = self._apply_label_transform2(labels)

        if self.raw_transform is not None:
            raw = self.raw_transform(raw)

        raw = _ensure_hwc(raw)
        labels = _ensure_hwc(labels)
        if consensus is None:
            return raw, labels
        return raw, labels, _ensure_hwc(consensus)


class DualImageCollectionDataset(_PatchDatasetBase):
    """Two-view (weak/strong) patches — reference
    my_image_collection_dataset.py:187-372. Returns (x, aug1(x), aug2(x), y)
    where x is the normalized raw patch."""

    def __init__(
        self,
        raw_images: Sequence[ArrayOrPath],
        label_images: Sequence[ArrayOrPath],
        *,
        patch_shape: Tuple[int, int],
        raw_transform: Optional[Callable] = standardize,
        label_transform: Optional[Callable] = None,
        label_transform2: Optional[Callable] = None,
        augmentation1: Optional[Callable] = None,
        augmentation2: Optional[Callable] = None,
        transform: Optional[Callable] = None,
        n_samples: Optional[int] = None,
        sampler: Optional[Callable] = None,
        seed: int = 0,
    ):
        if len(raw_images) != len(label_images):
            raise ValueError(
                f"Expect same number of raw and label images, got "
                f"{len(raw_images)} and {len(label_images)}"
            )
        super().__init__(
            patch_shape,
            n_samples=n_samples,
            n_images=len(raw_images),
            sampler=sampler,
            seed=seed,
        )
        self.raw_images = list(raw_images)
        self.label_images = list(label_images)
        self.raw_transform = raw_transform
        self.label_transform = label_transform
        self.label_transform2 = label_transform2
        self.augmentation1 = augmentation1
        self.augmentation2 = augmentation2
        self.transform = transform if transform is not None else get_augmentations(2)

    def sample(self, index: int, rng: np.random.Generator):
        if self.sample_random_index:
            index = int(rng.integers(0, len(self.raw_images)))
        index = index % len(self.raw_images)
        raw_full = self._load(self.raw_images[index])
        label_full = self._load(self.label_images[index])
        raw, labels = self._crop_with_rejection([raw_full, label_full], rng)
        raw = raw.astype(np.float32)

        if self.label_transform is not None:
            labels = self.label_transform(labels)
        labels = np.asarray(labels, dtype=np.float32)

        if self.transform is not None:
            raw, labels = self.transform([raw, labels], rng)

        labels = self._apply_label_transform2(labels)

        # No augmentations -> plain (x, y) tuple, exactly like the reference
        # (my_image_collection_dataset.py:369-372) — the lung supervised
        # scripts build Dual datasets without augs and expect 2-tuples.
        if self.augmentation1 is None and self.augmentation2 is None:
            if self.raw_transform is not None:
                raw = self.raw_transform(raw)
            return _ensure_hwc(raw), _ensure_hwc(labels)

        # Two augmented views of the (pre-normalization) raw patch
        # (reference :349-357: augs applied to copies of the raw patch; the
        # reference's weak/strong augs begin with standardize themselves).
        raw1 = raw.copy()
        raw2 = raw.copy()
        if self.augmentation1 is not None:
            raw1 = self.augmentation1(raw1, rng)
        if self.augmentation2 is not None:
            raw2 = self.augmentation2(raw2, rng)

        if self.raw_transform is not None:
            raw = self.raw_transform(raw)

        return (
            _ensure_hwc(raw),
            _ensure_hwc(raw1),
            _ensure_hwc(raw2),
            _ensure_hwc(labels),
        )


class DualRawImageCollectionDataset(_PatchDatasetBase):
    """Unlabeled two-view patches; fabricates a dummy binary label from the
    raw patch for tuple-shape consistency — reference
    my_raw_image_collection_dataset.py:9-145 (:135-140 for the dummy label)."""

    def __init__(
        self,
        raw_images: Sequence[ArrayOrPath],
        *,
        patch_shape: Tuple[int, int],
        raw_transform: Optional[Callable] = standardize,
        augmentation1: Optional[Callable] = None,
        augmentation2: Optional[Callable] = None,
        n_samples: Optional[int] = None,
        sampler: Optional[Callable] = None,
        seed: int = 0,
    ):
        super().__init__(
            patch_shape,
            n_samples=n_samples,
            n_images=len(raw_images),
            sampler=None,  # base rejection is (raw, labels); ours is raw-only
            seed=seed,
        )
        self.raw_images = list(raw_images)
        self.raw_transform = raw_transform
        self.augmentation1 = augmentation1
        self.augmentation2 = augmentation2
        #: raw-only rejection criterion, called as sampler(raw_patch) —
        #: reference my_raw_image_collection_dataset.py:97-104
        self.raw_sampler = sampler

    def sample(self, index: int, rng: np.random.Generator):
        if self.sample_random_index:
            index = int(rng.integers(0, len(self.raw_images)))
        index = index % len(self.raw_images)
        raw_full = self._load(self.raw_images[index])
        for _ in range(MAX_SAMPLING_ATTEMPTS):
            bb = self._bounding_box(raw_full.shape[:2], rng)
            raw = np.array(raw_full[bb]).astype(np.float32)
            if self.raw_sampler is None or self.raw_sampler(raw):
                break
        else:
            raise RuntimeError(
                f"Could not sample a valid patch in "
                f"{MAX_SAMPLING_ATTEMPTS} attempts"
            )

        if self.augmentation1 is None and self.augmentation2 is None:
            if self.raw_transform is not None:
                raw = self.raw_transform(raw)
            # dummy label from the TRANSFORMED raw, as the reference does
            # (__getitem__ applies raw_transform before `_labels =
            # deepcopy(raw)`, my_raw_image_collection_dataset.py:114,136-140)
            return _ensure_hwc(raw), _ensure_hwc((raw > 0).astype(np.float32))

        raw1, raw2 = raw.copy(), raw.copy()
        if self.augmentation1 is not None:
            raw1 = self.augmentation1(raw1, rng)
        if self.augmentation2 is not None:
            raw2 = self.augmentation2(raw2, rng)
        if self.raw_transform is not None:
            raw = self.raw_transform(raw)

        dummy = (raw > 0).astype(np.float32)
        return (
            _ensure_hwc(raw),
            _ensure_hwc(raw1),
            _ensure_hwc(raw2),
            _ensure_hwc(dummy),
        )


class LazyH5Volume:
    """Windowed, thread- and pickle-safe view of one H5 dataset.

    The elf ``open_file`` + ``RoiWrapper`` equivalent (reference
    my_segmentation_datasets.py:56-70, pickle-safe reopen :196-232): nothing
    is read until indexed, so multi-GB MitoEM volumes never materialize in
    RAM; each access reads only the requested window. A single process-level
    handle is shared behind a lock (h5py reads are short; the loader's worker
    threads contend only on the read itself).
    """

    def __init__(self, path: str, key: str, roi: Optional[slice] = None):
        import threading

        self.path = path
        self.key = key
        self._file = None
        self._lock = threading.Lock()
        with self._dataset() as d:
            shape = d.shape
            self.dtype = d.dtype
        self._start, self._stop, self._step = (
            roi.indices(shape[0]) if roi is not None else (0, shape[0], 1)
        )
        if self._step <= 0:
            raise ValueError(f"roi step must be positive, got {roi}")
        n0 = max(0, -(-(self._stop - self._start) // self._step))
        self.shape = (n0, *shape[1:])
        self.ndim = len(self.shape)

    @contextmanager
    def _dataset(self):
        import h5py

        with self._lock:
            if self._file is None:
                # 64MB chunk cache so repeated window reads of compressed
                # chunks don't re-decompress every access
                self._file = h5py.File(
                    self.path, "r", rdcc_nbytes=64 * 1024 * 1024, rdcc_nslots=99991
                )
            yield self._file[self.key]

    def __getitem__(self, index):
        if not isinstance(index, tuple):
            index = (index,)
        first = index[0]
        if isinstance(first, (int, np.integer)):
            i = int(first)
            if i < 0:
                i += self.shape[0]
            if not 0 <= i < self.shape[0]:
                raise IndexError(
                    f"index {int(first)} out of range for ROI axis of "
                    f"length {self.shape[0]}"
                )
            first = self._start + i * self._step
        elif isinstance(first, slice):
            if first.step is not None and first.step < 0:
                # mapping a negative-step stop through _start produces -1,
                # which h5py reinterprets as "last element" (empty read)
                raise IndexError(
                    "negative-step slices are not supported on the lazy "
                    "ROI axis; read the window and reverse on the host"
                )
            lo, hi, st = first.indices(self.shape[0])
            first = slice(
                self._start + lo * self._step,
                self._start + hi * self._step,
                st * self._step,
            )
        with self._dataset() as d:
            return np.asarray(d[(first,) + index[1:]])

    def __getstate__(self):
        state = self.__dict__.copy()
        state["_file"] = None
        state["_lock"] = None
        return state

    def __setstate__(self, state):
        import threading

        self.__dict__.update(state)
        self._lock = threading.Lock()


class SegmentationDataset(_PatchDatasetBase):
    """2D random crops from H5 volumes (elf/torch_em SegmentationDataset
    equivalent; reference my_segmentation_datasets.py). ``roi`` restricts the
    slice range along axis 0 (elf RoiWrapper equivalent, :56-70)."""

    #: volumes larger than this (bytes, on-disk dataset size) are read lazily
    #: slice-by-slice instead of being materialized in RAM (reference reads
    #: through elf's lazy RoiWrapper, my_segmentation_datasets.py:56-70;
    #: MitoEM training volumes are multi-GB).
    EAGER_LIMIT_BYTES = 512 * 1024 * 1024

    def __init__(
        self,
        raw_path: Union[str, np.ndarray],
        label_path: Union[str, np.ndarray, None],
        *,
        raw_key: str = "raw",
        label_key: str = "labels",
        patch_shape: Tuple[int, int],
        roi: Optional[slice] = None,
        raw_transform: Optional[Callable] = standardize,
        label_transform: Optional[Callable] = None,
        label_transform2: Optional[Callable] = None,
        transform: Optional[Callable] = None,
        n_samples: Optional[int] = None,
        sampler: Optional[Callable] = None,
        seed: int = 0,
        lazy: Optional[bool] = None,
    ):
        self.raw = self._open(raw_path, raw_key, roi, lazy)
        self.labels = (
            self._open(label_path, label_key, roi, lazy)
            if label_path is not None
            else None
        )
        # 3D volume of 2D slices, or a single 2D image
        n_slices = self.raw.shape[0] if self.raw.ndim == 3 else 1
        super().__init__(
            patch_shape,
            n_samples=n_samples,
            n_images=n_slices,
            sampler=sampler,
            seed=seed,
        )
        self.raw_transform = raw_transform
        self.label_transform = label_transform
        self.label_transform2 = label_transform2
        self.transform = transform if transform is not None else get_augmentations(2)

    @classmethod
    def _open(cls, path, key, roi=None, lazy=None):
        if isinstance(path, np.ndarray):
            return path if roi is None else path[roi]
        import h5py

        with h5py.File(path, "r") as f:
            dset = f[key]
            nbytes = int(np.prod(dset.shape)) * dset.dtype.itemsize
            if lazy is None:
                lazy = nbytes > cls.EAGER_LIMIT_BYTES
            if not lazy:
                data = dset[:]
                return data if roi is None else data[roi]
        return LazyH5Volume(path, key, roi=roi)

    def _slice(self, index: int, rng):
        if self.raw.ndim == 3:
            if self.sample_random_index:
                index = int(rng.integers(0, self.raw.shape[0]))
            raw = self.raw[index % self.raw.shape[0]]
            labels = None if self.labels is None else self.labels[index % self.raw.shape[0]]
        else:
            raw, labels = self.raw, self.labels
        return raw, labels

    def sample(self, index: int, rng: np.random.Generator):
        raw_full, label_full = self._slice(index, rng)
        arrays = [raw_full] if label_full is None else [raw_full, label_full]
        patches = self._crop_with_rejection(arrays, rng)
        raw = patches[0].astype(np.float32)
        labels = patches[1] if len(patches) > 1 else np.zeros_like(raw)

        if self.label_transform is not None:
            labels = self.label_transform(labels)
        labels = np.asarray(labels, dtype=np.float32)
        if self.transform is not None:
            raw, labels = self.transform([raw, labels], rng)
        labels = self._apply_label_transform2(labels)
        if self.raw_transform is not None:
            raw = self.raw_transform(raw)
        return _ensure_hwc(raw), _ensure_hwc(labels)


class DualSegmentationDataset(SegmentationDataset):
    """Two-view variant of :class:`SegmentationDataset` — reference
    my_segmentation_datasets.py:173-194 (returns x, aug1, aug2, y)."""

    def __init__(self, *args, augmentation1=None, augmentation2=None, **kwargs):
        super().__init__(*args, **kwargs)
        self.augmentation1 = augmentation1
        self.augmentation2 = augmentation2

    def sample(self, index: int, rng: np.random.Generator):
        raw_full, label_full = self._slice(index, rng)
        arrays = [raw_full] if label_full is None else [raw_full, label_full]
        patches = self._crop_with_rejection(arrays, rng)
        raw = patches[0].astype(np.float32)
        labels = patches[1] if len(patches) > 1 else np.zeros_like(raw)

        if self.label_transform is not None:
            labels = self.label_transform(labels)
        labels = np.asarray(labels, dtype=np.float32)
        if self.transform is not None:
            raw, labels = self.transform([raw, labels], rng)
        labels = self._apply_label_transform2(labels)

        if self.augmentation1 is None and self.augmentation2 is None:
            if self.raw_transform is not None:
                raw = self.raw_transform(raw)
            return _ensure_hwc(raw), _ensure_hwc(labels)

        raw1, raw2 = raw.copy(), raw.copy()
        if self.augmentation1 is not None:
            raw1 = self.augmentation1(raw1, rng)
        if self.augmentation2 is not None:
            raw2 = self.augmentation2(raw2, rng)
        if self.raw_transform is not None:
            raw = self.raw_transform(raw)

        return (
            _ensure_hwc(raw),
            _ensure_hwc(raw1),
            _ensure_hwc(raw2),
            _ensure_hwc(labels),
        )


class ConcatDataset(_PatchDatasetBase):
    """Concatenate datasets (torch_em segmentation.ConcatDataset equivalent;
    reference my_segmentation_datasets.py:314-355 builds one per volume)."""

    def __init__(self, *datasets):
        self.datasets = list(datasets)
        lens = [len(d) for d in self.datasets]
        self._offsets = np.cumsum([0] + lens)
        super().__init__(
            datasets[0].patch_shape, n_samples=None, n_images=int(self._offsets[-1])
        )

    def sample(self, index: int, rng: np.random.Generator):
        ds_idx = int(np.searchsorted(self._offsets, index, side="right") - 1)
        return self.datasets[ds_idx].sample(index - int(self._offsets[ds_idx]), rng)
