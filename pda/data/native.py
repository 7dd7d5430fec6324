"""ctypes bindings to the native host-side data-path library (pda_native).

The C++ library (native/pda_native.cpp) implements the per-sample host work —
standardize, crop, gaussian blur, additive noise, contrast, and a fused weak
augmentation — with a plain C ABI, so every call releases the GIL and the
thread-pool loader scales across cores.

``available()`` reports whether the shared library could be built/loaded;
the numpy/cv2 transforms in pda.data.transforms remain the reference
implementations and the fallback.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SRC = os.path.abspath(os.path.join(_NATIVE_DIR, "pda_native.cpp"))
_SO = os.path.abspath(os.path.join(_NATIVE_DIR, "libpda_native.so"))

_f32p = np.ctypeslib.ndpointer(dtype=np.float32, flags="C_CONTIGUOUS")


def _build() -> bool:
    if not os.path.exists(_SRC):
        return False
    cmd = ["g++", "-O3", "-march=native", "-ffast-math", "-shared",
           "-fPIC", _SRC, "-o", _SO]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if not os.path.exists(_SO) or (
        os.path.exists(_SRC)
        and os.path.getmtime(_SRC) > os.path.getmtime(_SO)
    ):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None

    lib.pda_standardize.argtypes = [_f32p, ctypes.c_int64, ctypes.c_float]
    lib.pda_crop.argtypes = [
        _f32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, _f32p,
    ]
    lib.pda_gaussian_blur.argtypes = [
        _f32p, _f32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_float, _f32p,
    ]
    lib.pda_add_gaussian_noise.argtypes = [
        _f32p, ctypes.c_int64, ctypes.c_float, ctypes.c_uint64, ctypes.c_int,
    ]
    lib.pda_random_contrast.argtypes = [_f32p, ctypes.c_int64, ctypes.c_float]
    lib.pda_weak_augment.argtypes = [
        _f32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_float,
        ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ctypes.c_uint64, _f32p,
    ]
    lib.pda_elastic_warp.argtypes = [
        _f32p, _f32p, ctypes.c_int64, ctypes.c_int64, _f32p, _f32p,
        ctypes.c_int,
    ]
    lib.pda_field_upsample.argtypes = [
        _f32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, _f32p,
    ]
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def _owned_f32(x: np.ndarray) -> np.ndarray:
    """Contiguous f32 copy that NEVER aliases the caller's memory — the C
    kernels mutate in place, and a full-width crop is a contiguous VIEW of
    the source image (mutating it would corrupt the cached dataset array)."""
    xc = np.ascontiguousarray(x, dtype=np.float32)
    return xc.copy() if xc is x else xc


def standardize(x: np.ndarray, eps: float = 1e-7) -> np.ndarray:
    lib = _load()
    x = _owned_f32(x)
    lib.pda_standardize(x.reshape(-1), x.size, eps)
    return x


def crop(src: np.ndarray, y0: int, x0: int, h: int, w: int) -> np.ndarray:
    lib = _load()
    src = np.ascontiguousarray(src, dtype=np.float32)
    out = np.empty((h, w), dtype=np.float32)
    lib.pda_crop(src, src.shape[0], src.shape[1], y0, x0, h, w, out)
    return out


def gaussian_blur(x: np.ndarray, sigma: float) -> np.ndarray:
    lib = _load()
    x = np.ascontiguousarray(x, dtype=np.float32)
    out = np.empty_like(x)
    scratch = np.empty_like(x)
    lib.pda_gaussian_blur(x, out, x.shape[0], x.shape[1], sigma, scratch)
    return out


def add_gaussian_noise(
    x: np.ndarray, std: float, seed: int, clip: bool = False
) -> np.ndarray:
    lib = _load()
    x = _owned_f32(x)
    lib.pda_add_gaussian_noise(x.reshape(-1), x.size, std, seed, int(clip))
    return x


def random_contrast(x: np.ndarray, alpha: float) -> np.ndarray:
    lib = _load()
    x = _owned_f32(x)
    lib.pda_random_contrast(x.reshape(-1), x.size, alpha)
    return x


def weak_augment(
    x: np.ndarray,
    *,
    p: float = 0.25,
    blur_sigma=(0.0, 3.0),
    noise=(0.0, 0.15),
    seed: int = 0,
) -> np.ndarray:
    """Fused standardize + p-gated blur + p-gated noise (one GIL-free call)."""
    lib = _load()
    x = _owned_f32(x)
    h, w = x.shape[:2]
    scratch = np.empty(2 * h * w, dtype=np.float32)
    lib.pda_weak_augment(
        x.reshape(-1), h, w, p, blur_sigma[0], blur_sigma[1],
        noise[0], noise[1], seed, scratch,
    )
    return x


def elastic_warp(
    x: np.ndarray, dy: np.ndarray, dx: np.ndarray, order: int = 1
) -> np.ndarray:
    """out(y, x) = in(y + dy, x + dx), reflect boundaries; order 1 = bilinear
    (raw), 0 = nearest (labels/masks). scipy map_coordinates equivalent on the
    loader hot path (~20x faster at 512^2)."""
    lib = _load()
    x = np.ascontiguousarray(x, dtype=np.float32)
    out = np.empty_like(x)
    lib.pda_elastic_warp(
        x, out, x.shape[0], x.shape[1],
        np.ascontiguousarray(dy, dtype=np.float32),
        np.ascontiguousarray(dx, dtype=np.float32),
        order,
    )
    return out


def field_upsample(coarse: np.ndarray, h: int, w: int) -> np.ndarray:
    """Bilinear-upsample a coarse (gh, gw) noise grid to an (h, w) field
    (JointAugmentations._field hot path)."""
    lib = _load()
    coarse = np.ascontiguousarray(coarse, dtype=np.float32)
    out = np.empty((h, w), dtype=np.float32)
    lib.pda_field_upsample(coarse, coarse.shape[0], coarse.shape[1], h, w, out)
    return out


class NativeWeakAugmentation:
    """Drop-in augmentation callable backed by the fused native kernel.

    Same recipe as :func:`pda.experiments.common.weak_augmentations`
    (standardize + RandomApply(p){blur, noise}) but one C call per sample.
    """

    def __init__(self, p: float = 0.25, blur_sigma=(0.0, 3.0), noise=(0.0, 0.15)):
        self.p = p
        self.blur_sigma = blur_sigma
        self.noise = noise

    def __call__(self, x: np.ndarray, rng: np.random.Generator) -> np.ndarray:
        seed = int(rng.integers(1, 2**63 - 1))
        return weak_augment(
            x, p=self.p, blur_sigma=self.blur_sigma, noise=self.noise, seed=seed
        )
