"""Host-side numpy transforms & augmentations.

Internalizes the torch_em transform surface the reference depends on
(SURVEY.md section 2.9): ``standardize``, ``GaussianBlur``,
``AdditiveGaussianNoise``, ``RandomContrast``, ``RandomApply``, ``Compose``,
``get_raw_transform`` and the joint geometric augmentations
(``get_augmentations(ndim=2)``). All are pure numpy/cv2 (no torch), operate
on float32 ``(H, W)`` or ``(H, W, C)`` arrays, and take an explicit
``numpy.random.Generator`` — JAX-style randomness discipline on the host
(SURVEY.md section 7 "Randomness discipline").

Reference call sites: weak augs LIVECell/livecell_mt.py:16-26, strong augs
livecell_fm.py:56-67 / livecell_adamatch.py:29-40, geometric
my_livecell.py:146.
"""

from __future__ import annotations

import os

from typing import Callable, Optional, Sequence, Tuple

import numpy as np

try:
    import cv2

    _HAS_CV2 = True
except Exception:  # pragma: no cover
    _HAS_CV2 = False

EPS = 1e-7


def standardize(
    x: np.ndarray,
    mean: Optional[float] = None,
    std: Optional[float] = None,
    eps: float = EPS,
) -> np.ndarray:
    """(x - mean) / (std + eps) — torch_em ``standardize`` /
    reference ``my_standardize_torch`` (prob_utils/my_utils/util.py:9-14).

    Default-stats calls take the native C path when available (~2x the numpy
    chain on the 512^2 loader hot path); PDA_NATIVE_AUGS=0 forces numpy."""
    if mean is None and std is None:
        import os

        from . import native

        if (
            os.environ.get("PDA_NATIVE_AUGS", "1") != "0"
            and native.available()
        ):
            return native.standardize(x, eps)
    x = np.asarray(x, dtype=np.float32)
    mean = x.mean() if mean is None else mean
    x = x - mean
    std = x.std() if std is None else std
    return x / (std + eps)


def normalize(x: np.ndarray, eps: float = EPS) -> np.ndarray:
    """Min-max to [0, 1] (torch_em ``_normalize_torch`` equivalent)."""
    x = np.asarray(x, dtype=np.float32)
    x = x - x.min()
    return x / (x.max() + eps)


class Compose:
    def __init__(self, *transforms: Callable):
        self.transforms = transforms

    def __call__(self, x: np.ndarray, rng: np.random.Generator) -> np.ndarray:
        for t in self.transforms:
            x = _call(t, x, rng)
        return x


def _takes_rng(t: Callable) -> bool:
    """Does the transform accept the rng? Decided by the presence of a
    parameter literally named ``rng`` in its signature — every random
    transform in this module declares one. NOT decided by try/except
    TypeError (which can silently bind the Generator to an unrelated
    positional like standardize's ``mean``, or mask a genuine TypeError
    raised inside the transform), and NOT by positional arity (same trap)."""
    import inspect

    try:
        sig = inspect.signature(t)
    except (TypeError, ValueError):
        # builtins/extensions without introspectable signatures: assume the
        # random-transform convention
        return True
    return "rng" in sig.parameters


def _call(t: Callable, x: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """Call a transform that may or may not take the rng."""
    if _takes_rng(t):
        return t(x, rng)
    return t(x)


class RandomApply:
    """Apply each transform with probability p (torchvision RandomApply
    equivalent; reference livecell_mt.py:20-22)."""

    def __init__(self, transforms: Sequence[Callable], p: float = 0.5):
        self.transforms = list(transforms)
        self.p = p

    def __call__(self, x: np.ndarray, rng: np.random.Generator) -> np.ndarray:
        if rng.random() < self.p:
            for t in self.transforms:
                x = _call(t, x, rng)
        return x


class GaussianBlur:
    """Random-sigma Gaussian blur (torch_em transform.raw.GaussianBlur).

    Default sigma range matches torch_em's (0, 3); the strong-aug scripts use
    (1, 4) (reference livecell_fm.py:59)."""

    def __init__(self, kernel_size=None, sigma: Tuple[float, float] = (0.0, 3.0)):
        self.sigma = sigma

    def __call__(self, x: np.ndarray, rng: np.random.Generator) -> np.ndarray:
        sigma = rng.uniform(*self.sigma)
        if sigma <= 0:
            return x
        if _HAS_CV2:
            squeeze = x.ndim == 3 and x.shape[-1] == 1
            src = x[..., 0] if squeeze else x
            out = cv2.GaussianBlur(
                np.ascontiguousarray(src, dtype=np.float32), (0, 0), sigma
            )
            return out[..., None] if squeeze else out
        from scipy.ndimage import gaussian_filter

        # blur the spatial axes only — the cv2 path above treats a trailing
        # channel axis as independent planes, and so must the fallback
        return gaussian_filter(x, (sigma, sigma) + (0,) * (x.ndim - 2))


class AdditiveGaussianNoise:
    """Additive noise with uniformly-sampled std
    (torch_em AdditiveGaussianNoise; reference livecell_mt.py:21 uses
    scale=(0, 0.15), clip_kwargs=False)."""

    def __init__(self, scale: Tuple[float, float] = (0.0, 0.3), clip_kwargs=False):
        self.scale = scale
        self.clip_kwargs = clip_kwargs

    def __call__(self, x: np.ndarray, rng: np.random.Generator) -> np.ndarray:
        std = rng.uniform(*self.scale)
        out = x + rng.normal(0.0, std, size=x.shape).astype(np.float32)
        if self.clip_kwargs:
            out = np.clip(out, 0.0, 1.0)
        return out


class RandomContrast:
    """mean + alpha * (x - mean) with random alpha (torch_em RandomContrast;
    reference livecell_fm.py:61 uses alpha=(0.33, 3), clip_kwargs=False)."""

    def __init__(self, alpha: Tuple[float, float] = (0.8, 1.2), mean: Optional[float] = None,
                 clip_kwargs=False):
        self.alpha = alpha
        self.mean = mean
        self.clip_kwargs = clip_kwargs

    def __call__(self, x: np.ndarray, rng: np.random.Generator) -> np.ndarray:
        alpha = rng.uniform(*self.alpha)
        mean = x.mean() if self.mean is None else self.mean
        out = mean + alpha * (x - mean)
        if self.clip_kwargs:
            out = np.clip(out, 0.0, 1.0)
        return out


def get_raw_transform(
    normalizer: Callable = standardize,
    augmentation1: Optional[Callable] = None,
    augmentation2: Optional[Callable] = None,
) -> Callable:
    """torch_em ``get_raw_transform`` equivalent: aug1 -> normalize -> aug2.

    NOTE the torch_em composition order: augmentation1 is applied on the raw
    data BEFORE normalization, augmentation2 after. The reference's weak augs
    put the normalizer first inside augmentation1 itself
    (livecell_mt.py:18-22), which we preserve by passing the same Compose.
    """

    def transform(x: np.ndarray, rng: np.random.Generator) -> np.ndarray:
        if augmentation1 is not None:
            x = _call(augmentation1, x, rng)
        x = normalizer(x)
        if augmentation2 is not None:
            x = _call(augmentation2, x, rng)
        return x

    return transform


# ---------------------------------------------------------------------------
# joint geometric augmentations (raw + label together)
# ---------------------------------------------------------------------------


class JointAugmentations:
    """Joint random flips + 90-degree rotations + elastic deformation for
    (raw, label[, mask]) tuples — the same spatial transform applied to every
    array of the tuple. Picklable (worker handoff) and driven by an explicit
    numpy Generator for determinism.

    Equivalent in role to torch_em ``transform.get_augmentations(ndim=2)``
    (reference my_livecell.py:146, my_segmentation_datasets.py:352-355),
    whose default recipe includes random elastic warps. The displacement
    field is gaussian-smoothed noise; raw channels warp bilinearly, every
    non-first array (labels, consensus masks) warps with nearest-neighbor so
    binary maps stay binary.
    """

    def __init__(
        self,
        ndim: int = 2,
        p_flip: float = 0.5,
        p_elastic: float = 0.25,
        alpha: float = 8.0,
        sigma: float = 16.0,
    ):
        assert ndim == 2, "only 2D supported"
        self.p_flip = p_flip
        self.p_elastic = p_elastic
        self.alpha = alpha
        self.sigma = sigma

    def _field(self, h: int, w: int, rng: np.random.Generator) -> np.ndarray:
        """Smooth displacement field: coarse noise bilinearly upsampled.

        Equivalent smoothness to gaussian-filtering full-res noise with
        ``sigma``, at a fraction of the host cost (the loader threads run
        this per sample): noise on a grid of spacing ~sigma interpolates to a
        field whose features have wavelength >= sigma."""
        step = max(int(self.sigma), 2)
        gh, gw = h // step + 3, w // step + 3
        coarse = rng.standard_normal((gh, gw)).astype(np.float32)
        from . import native

        if native.available() and os.environ.get("PDA_NATIVE_AUGS", "1") != "0":
            return native.field_upsample(coarse, h, w)
        # bilinear upsample coarse -> (h, w)
        ys = np.linspace(0, gh - 1.001, h, dtype=np.float32)
        xs = np.linspace(0, gw - 1.001, w, dtype=np.float32)
        y0 = ys.astype(np.int32)
        x0 = xs.astype(np.int32)
        fy = (ys - y0)[:, None]
        fx = (xs - x0)[None, :]
        c00 = coarse[y0][:, x0]
        c01 = coarse[y0][:, x0 + 1]
        c10 = coarse[y0 + 1][:, x0]
        c11 = coarse[y0 + 1][:, x0 + 1]
        return (
            c00 * (1 - fy) * (1 - fx)
            + c01 * (1 - fy) * fx
            + c10 * fy * (1 - fx)
            + c11 * fy * fx
        )

    def _elastic(self, arrays, rng: np.random.Generator):
        h, w = arrays[0].shape[:2]
        dy = self._field(h, w, rng)
        dx = self._field(h, w, rng)
        # normalize the smoothed field so alpha is the max displacement in px
        norm = max(np.abs(dy).max(), np.abs(dx).max(), 1e-8)
        dy = dy * (self.alpha / norm)
        dx = dx * (self.alpha / norm)

        from . import native

        use_native = native.available() and os.environ.get(
            "PDA_NATIVE_AUGS", "1"
        ) != "0"

        def warp2d(a, order):
            if use_native:
                return native.elastic_warp(a, dy, dx, order=order)
            from scipy.ndimage import map_coordinates

            yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
            return map_coordinates(
                a, np.stack([yy + dy, xx + dx]), order=order, mode="reflect"
            )

        out = []
        for i, a in enumerate(arrays):
            order = 1 if i == 0 else 0  # raw bilinear, labels/masks nearest
            if a.ndim == 2:
                warped = warp2d(a, order)
            else:
                warped = np.stack(
                    [warp2d(a[..., c], order) for c in range(a.shape[-1])],
                    axis=-1,
                )
            out.append(warped.astype(a.dtype, copy=False))
        return out

    def __call__(self, arrays: Sequence[np.ndarray], rng: np.random.Generator):
        h0, w0 = arrays[0].shape[:2]
        if h0 == w0:
            k = int(rng.integers(0, 4))
        else:
            # odd quarter-turns swap H/W, which would make samples of a
            # non-square patch_shape un-stackable — restrict to 180 degrees
            k = 2 * int(rng.integers(0, 2))
        flip_h = rng.random() < self.p_flip
        flip_v = rng.random() < self.p_flip
        do_elastic = self.p_elastic > 0 and rng.random() < self.p_elastic

        out = []
        for a in arrays:
            if k:
                a = np.rot90(a, k, axes=(0, 1))
            if flip_h:
                a = a[:, ::-1]
            if flip_v:
                a = a[::-1, :]
            out.append(np.ascontiguousarray(a))
        if do_elastic:
            out = self._elastic(out, rng)
        return tuple(out)


def get_augmentations(
    ndim: int = 2, p_flip: float = 0.5, p_elastic: float = 0.25
) -> Callable:
    """torch_em ``transform.get_augmentations(ndim=2)`` equivalent — see
    :class:`JointAugmentations`."""
    return JointAugmentations(ndim=ndim, p_flip=p_flip, p_elastic=p_elastic)


# ---------------------------------------------------------------------------
# label transforms (torch_em transform.label equivalents)
# ---------------------------------------------------------------------------


def labels_to_binary(labels: np.ndarray) -> np.ndarray:
    """Instance labels -> binary foreground (torch_em labels_to_binary;
    reference my_livecell.py:188-192)."""
    return (np.asarray(labels) > 0).astype(np.float32)


def boundary_transform(labels: np.ndarray) -> np.ndarray:
    """Instance labels -> boundary map (torch_em BoundaryTransform equivalent;
    reference my_livecell.py:193-199). A pixel is boundary if any 4-neighbor
    has a different instance id."""
    lab = np.asarray(labels)
    b = np.zeros(lab.shape, dtype=bool)
    b[:-1, :] |= lab[:-1, :] != lab[1:, :]
    b[1:, :] |= lab[1:, :] != lab[:-1, :]
    b[:, :-1] |= lab[:, :-1] != lab[:, 1:]
    b[:, 1:] |= lab[:, 1:] != lab[:, :-1]
    return b.astype(np.float32)


def affinity_transform(labels: np.ndarray, offsets=((0, 1), (1, 0))) -> np.ndarray:
    """Instance labels -> affinity channels (torch_em AffinityTransform
    equivalent; reference my_livecell.py:188-194). Channel last.

    Convention: affogato's ``compute_affinities`` (which torch_em wraps) is
    pure label equality in the MALA convention — affinity 1 where the two
    endpoints carry the SAME label, including background-background pairs
    (0 == 0 -> 1). Background is only excluded via ``ignore_label``, which
    the reference factories never pass. Out-of-bounds edges get affinity 0
    (and validity-mask 0, see ``_affinity_mask``)."""
    lab = np.asarray(labels)
    chans = []
    for dy, dx in offsets:
        aff = np.zeros(lab.shape, dtype=np.float32)
        h, w = lab.shape[:2]
        src = lab[max(0, -dy) : h - max(0, dy), max(0, -dx) : w - max(0, dx)]
        dst = lab[max(0, dy) : h + min(0, dy) or h, max(0, dx) : w + min(0, dx) or w]
        same = src == dst
        aff[max(0, -dy) : h - max(0, dy), max(0, -dx) : w - max(0, dx)] = same
        chans.append(aff)
    return np.stack(chans, axis=-1)


def _affinity_mask(shape, offsets) -> np.ndarray:
    """Validity mask per affinity channel: 1 where both endpoints of the
    offset edge are in bounds (torch_em AffinityTransform ``add_mask``)."""
    h, w = shape[:2]
    chans = []
    for dy, dx in offsets:
        m = np.zeros((h, w), dtype=np.float32)
        m[max(0, -dy) : h - max(0, dy), max(0, -dx) : w - max(0, dx)] = 1.0
        chans.append(m)
    return np.stack(chans, axis=-1)


class BoundaryTransform:
    """Callable label transform: instance labels -> boundary map, optionally
    with the binary foreground map prepended as an extra channel —
    torch_em ``BoundaryTransform(add_binary_target=True)`` as selected by the
    reference loader factories (my_livecell.py:196-199). Channel-last."""

    def __init__(self, add_binary_target: bool = False):
        self.add_binary_target = add_binary_target

    def __call__(self, labels: np.ndarray) -> np.ndarray:
        b = boundary_transform(labels)[..., None]
        if not self.add_binary_target:
            return b
        fg = labels_to_binary(labels)[..., None]
        return np.concatenate([fg, b], axis=-1)


class AffinityTransform:
    """Callable label transform: instance labels -> affinity channels,
    optionally prepending the binary foreground map (``add_binary_target``)
    and appending per-offset validity-mask channels (``add_mask``) —
    torch_em ``AffinityTransform(offsets, add_binary_target=True,
    add_mask=True)`` as selected by the reference loader factories
    (my_livecell.py:189-195). Channel-last:
    [binary? | affinities | masks?]. With ``add_mask`` the binary channel's
    mask (all ones) is included so the mask block is one-to-one with the
    target block, matching torch_em's convention."""

    def __init__(self, offsets, add_binary_target: bool = False,
                 add_mask: bool = False):
        self.offsets = tuple(tuple(o) for o in offsets)
        self.add_binary_target = add_binary_target
        self.add_mask = add_mask

    def __call__(self, labels: np.ndarray) -> np.ndarray:
        labels = np.asarray(labels)
        affs = affinity_transform(labels, self.offsets)
        parts = [affs]
        if self.add_binary_target:
            parts.insert(0, labels_to_binary(labels)[..., None])
        if self.add_mask:
            mask = _affinity_mask(labels.shape, self.offsets)
            if self.add_binary_target:
                ones = np.ones(labels.shape[:2] + (1,), dtype=np.float32)
                mask = np.concatenate([ones, mask], axis=-1)
            parts.append(mask)
        return np.concatenate(parts, axis=-1)


def select_label_transform(offsets=None, boundaries: bool = False,
                           binary: bool = False):
    """The reference loader factories' label-transform selector
    (my_livecell.py:187-205): at most one of ``offsets``/``boundaries``/
    ``binary``.

    Returns ``(label_transform, label_transform2)``: the reference wires
    ``AffinityTransform`` as ``label_transform2`` — applied AFTER the joint
    spatial augmentation (my_livecell.py:189-194,
    my_image_collection_dataset.py:176-178) so flips/rotations cannot
    mis-orient the direction-specific affinity channels and validity masks —
    while boundaries/binary run BEFORE augmentation as ``label_transform``.
    """
    assert sum((offsets is not None, bool(boundaries), bool(binary))) <= 1, (
        "pass at most one of offsets= / boundaries= / binary="
    )
    if offsets is not None:
        return None, AffinityTransform(
            offsets, add_binary_target=True, add_mask=True
        )
    if boundaries:
        return BoundaryTransform(add_binary_target=True), None
    if binary:
        return labels_to_binary, None
    return None, None
