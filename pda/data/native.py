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
import threading
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False
_LOAD_LOCK = threading.Lock()

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SRC = os.path.abspath(os.path.join(_NATIVE_DIR, "pda_native.cpp"))
_SO = os.path.abspath(os.path.join(_NATIVE_DIR, "libpda_native.so"))

_f32p = np.ctypeslib.ndpointer(dtype=np.float32, flags="C_CONTIGUOUS")


def _build() -> bool:
    """Compile the library ATOMICALLY: write to a pid-unique temp path and
    os.replace into place, so concurrent builders (loader worker processes,
    parallel trainings sharing the checkout) can never dlopen a half-written
    .so or corrupt each other's output — the last finished build wins."""
    if not os.path.exists(_SRC):
        return False
    tmp = f"{_SO}.build.{os.getpid()}"
    cmd = ["g++", "-O3", "-march=native", "-ffast-math", "-shared",
           "-fPIC", _SRC, "-o", tmp]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(tmp, _SO)
        return True
    except Exception:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    with _LOAD_LOCK:
        if _TRIED:
            return _LIB
        lib = _load_locked()
        _LIB = lib
        _TRIED = True
        return _LIB


def _load_locked() -> Optional[ctypes.CDLL]:
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
    return lib


def available() -> bool:
    return _load() is not None


def _lib() -> ctypes.CDLL:
    """The loaded library, or a clear error (never an opaque None-deref)."""
    lib = _load()
    if lib is None:
        raise RuntimeError(
            "pda native library unavailable (g++ build or dlopen failed); "
            "guard calls with pda.data.native.available() or use the numpy "
            "transforms in pda.data.transforms"
        )
    return lib


def _owned_f32(x: np.ndarray) -> np.ndarray:
    """Contiguous f32 copy that NEVER aliases the caller's memory — the C
    kernels mutate in place, and a full-width crop is a contiguous VIEW of
    the source image (mutating it would corrupt the cached dataset array)."""
    xc = np.ascontiguousarray(x, dtype=np.float32)
    return xc.copy() if xc is x else xc


def standardize(x: np.ndarray, eps: float = 1e-7) -> np.ndarray:
    lib = _lib()
    x = _owned_f32(x)
    lib.pda_standardize(x.reshape(-1), x.size, eps)
    return x


def crop(src: np.ndarray, y0: int, x0: int, h: int, w: int) -> np.ndarray:
    lib = _lib()
    src = np.ascontiguousarray(src, dtype=np.float32)
    out = np.empty((h, w), dtype=np.float32)
    lib.pda_crop(src, src.shape[0], src.shape[1], y0, x0, h, w, out)
    return out


def _plane_2d(x: np.ndarray, what: str) -> np.ndarray:
    """The C kernels are 2-D plane operators: accept (H, W) or (H, W, 1)
    and return the plane view — anything else would silently process the
    first H*W floats of an interleaved buffer as if they were the image."""
    if x.ndim == 3 and x.shape[-1] == 1:
        return x[..., 0]
    if x.ndim == 2:
        return x
    raise ValueError(
        f"{what} handles (H, W) / (H, W, 1) images, got {x.shape}"
    )


def gaussian_blur(x: np.ndarray, sigma: float) -> np.ndarray:
    lib = _lib()
    x = np.ascontiguousarray(x, dtype=np.float32)
    plane = _plane_2d(x, "gaussian_blur")
    out = np.empty_like(x)
    scratch = np.empty_like(plane)
    lib.pda_gaussian_blur(
        plane, out.reshape(plane.shape), plane.shape[0], plane.shape[1],
        sigma, scratch,
    )
    return out


def add_gaussian_noise(
    x: np.ndarray, std: float, seed: int, clip: bool = False
) -> np.ndarray:
    lib = _lib()
    x = _owned_f32(x)
    lib.pda_add_gaussian_noise(x.reshape(-1), x.size, std, seed, int(clip))
    return x


def random_contrast(x: np.ndarray, alpha: float) -> np.ndarray:
    lib = _lib()
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
    """Fused standardize + p-gated blur + p-gated noise (one GIL-free call).

    Accepts (H, W) or single-channel (H, W, 1); multi-channel input is
    rejected (the C kernel is a 2-D plane operator — passing h*w for an
    h*w*C buffer would silently augment garbage)."""
    lib = _lib()
    x = _owned_f32(x)
    if x.ndim == 3 and x.shape[-1] == 1:
        view = x[..., 0]
    elif x.ndim == 2:
        view = x
    else:
        raise ValueError(
            f"weak_augment handles (H, W) / (H, W, 1) images, got {x.shape}; "
            "use the numpy Compose recipe for multi-channel input"
        )
    h, w = view.shape
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
    lib = _lib()
    x = np.ascontiguousarray(x, dtype=np.float32)
    plane = _plane_2d(x, "elastic_warp")
    out = np.empty_like(x)
    lib.pda_elastic_warp(
        plane, out.reshape(plane.shape), plane.shape[0], plane.shape[1],
        np.ascontiguousarray(dy, dtype=np.float32),
        np.ascontiguousarray(dx, dtype=np.float32),
        order,
    )
    return out


def field_upsample(coarse: np.ndarray, h: int, w: int) -> np.ndarray:
    """Bilinear-upsample a coarse (gh, gw) noise grid to an (h, w) field
    (JointAugmentations._field hot path)."""
    lib = _lib()
    coarse = np.ascontiguousarray(coarse, dtype=np.float32)
    out = np.empty((h, w), dtype=np.float32)
    lib.pda_field_upsample(coarse, coarse.shape[0], coarse.shape[1], h, w, out)
    return out


class NativeWeakAugmentation:
    """Drop-in augmentation callable backed by the fused native kernel.

    Same recipe as :func:`pda.experiments.common.weak_augmentations`
    (standardize + RandomApply(p){blur, noise}) but one C call per sample.
    Multi-channel samples (the C kernel is a 2-D plane operator) route
    through the equivalent numpy Compose transparently.
    """

    def __init__(self, p: float = 0.25, blur_sigma=(0.0, 3.0), noise=(0.0, 0.15)):
        self.p = p
        self.blur_sigma = blur_sigma
        self.noise = noise
        self._numpy_fallback = None

    def _fallback(self):
        if self._numpy_fallback is None:
            from .transforms import (
                AdditiveGaussianNoise,
                Compose,
                GaussianBlur,
                RandomApply,
                standardize as np_standardize,
            )

            self._numpy_fallback = Compose(
                np_standardize,
                RandomApply([GaussianBlur(sigma=self.blur_sigma)], p=self.p),
                RandomApply(
                    [AdditiveGaussianNoise(scale=self.noise, clip_kwargs=False)],
                    p=self.p,
                ),
            )
        return self._numpy_fallback

    def __call__(self, x: np.ndarray, rng: np.random.Generator) -> np.ndarray:
        if not (x.ndim == 2 or (x.ndim == 3 and x.shape[-1] == 1)):
            return self._fallback()(x, rng)
        seed = int(rng.integers(1, 2**63 - 1))
        return weak_augment(
            x, p=self.p, blur_sigma=self.blur_sigma, noise=self.noise, seed=seed
        )
